"""Pallas TPU kernels for the warp renderer (the BASELINE north star's
"Pallas kernel" — tiled over particles/steps and screen windows rather
than literal screen tiles, because the warp factorization makes
per-particle images the natural work unit; see render/warp.py).

The production path is ONE fused kernel per frame
(``march_warp_pallas`` with ``canvas``/``comp``), grid (N, SG) over the
DEPTH-ORDERED particle list:

* per (particle, step-group) the pre-lerped marching slabs arrive as an
  auto-pipelined [1, S, V, V] block (render/warp.bake_march_slabs; the
  whole bank stays VMEM-resident when small), hat weight matrices are
  built on the VPU, and MXU contractions produce the [RP, RP] density
  (and optical-depth) grid per step; factored scalar-weight accumulators
  (P1 = sum T*alpha*atten, P2 = sum T*alpha) live in VMEM scratch;
* the particle's canvas window fetch is issued at its FIRST grid step,
  overlapping its whole march;
* the last grid step runs the fan correction AT MARCH RESOLUTION
  (combined-weight masked static shifts over the P planes in march-cell
  units; unlit shifts the LINEAR optical depth), applies the unlit/
  center exps still at march resolution (the upsampled quantity is the
  saturated P1/P2), then hat-upsamples DIRECTLY INTO WINDOW COORDINATES
  — the (dy, dx) sub-tile placement folds into in-kernel-built shifted
  upsample weights — and RMWs the [4, WH, WW] canvas window in place
  with scalar-hoisted channel fmas.  The window's rare B half (rect
  past the A-half columns) is fetched/RMW'd/written synchronously under
  a prefetched ``wide`` flag; the A half is double-buffered so the
  write-back overlaps the next particle's march unless their windows
  intersect (precomputed hazards).

The unfused pair (``march_warp_pallas`` without canvas +
``composite_chunk_pallas``) remains for A/B testing
(cfg.render.warp_fused=False).

Semantics are identical to the XLA path (same fp32 decision math, same
bf16 rounding points); both are held to oracle/warp_cpu.py's 1e-3.
On CPU backends the kernels run in interpret mode (tests)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volq.core.types import Camera, Light, Particles
from volq.scene.config import SceneConfig

_EPS = 1e-6

# perf-triage switch, NOT a user feature:
# VOLQ_ABLATE=weights|dot1|dot2|fan|up|comp|windma|march removes one
# class of in-kernel work so A/B timing can attribute the march cost;
# classes compose with "+" ("fan+up+comp+windma" strips the whole
# epilogue, sizing the residual base the single-class marginals hide
# because MXU/VPU/DMA overlap).  Results are wrong images; never set
# outside experiments.  Read once at import; bench/ablate_c3.py
# monkeypatches the module global instead.
import os as _os
import sys as _sys
_ABLATE = _os.environ.get("VOLQ_ABLATE", "")
if _ABLATE:
    print(f"volq: VOLQ_ABLATE={_ABLATE!r} is set — kernels will produce "
          "WRONG images (perf-attribution mode)", file=_sys.stderr)


def _abl(tag: str) -> bool:
    """Ablation-mode membership: _ABLATE is a +-joined set of classes
    ("fan+up+comp" removes all three), so compound ablations can size
    the kernel's residual base cost, not just one class's marginal."""
    return tag in _ABLATE.split("+")


# cap the march unroll U (0 = preset-derived): the U sweep separates
# per-grid-step fixed cost (time grows as U shrinks) from
# code-size/instruction-streaming cost (time SHRINKS as U shrinks)
_FORCE_UCAP = int(_os.environ.get("VOLQ_UCAP", "0"))
# triage: force per-n input specs to CONSTANT index maps ("pern" =
# gf/rxu/ryw, "mid" = the streamed light mid-slabs, "stack" = the
# per-particle volume slab stacks; '+'-composable).  Values are then
# garbage (block 0 for every n) — floor-arm A/Bs only, prices the
# per-n block-change machinery itself.
_CONSTSPEC = _os.environ.get("VOLQ_CONSTSPEC", "")


def _cspec(tag: str) -> bool:
    return tag in _CONSTSPEC.split("+")

# geomf packing (per-particle f32 scalars; one [1, 16] SMEM block per n)
_G_LOX, _G_LOY, _G_LOZ, _G_EXT, _G_SCALE, _G_SZN, _G_VALID = range(7)
_G_ALB_R, _G_ALB_G, _G_ALB_B, _G_SX0, _G_SY0, _G_PXC, _G_PYC = range(7, 14)
# fused only: the particle's canvas placement position (pad + s0*ratio,
# fractional in coarse mode) — computed ONCE host-side
# (warp._window_corners) so kernel and host can never disagree
_G_AYF, _G_AXF = 14, 15
_GF = 16


# Mosaic's default scoped-VMEM budget is 16 MiB; some measurement arms
# (rm48 compounds, wide packs) spill past it by a few hundred KiB while
# total VMEM (128 MiB on v5e) has plenty of room.  Env-gated so the A/B
# harness can admit those arms; 0 = compiler default.  A preset that
# ships a config needing this must carry it as a config flag instead.
_VMEM_LIMIT_KIB = int(_os.environ.get("VOLQ_VMEM_LIMIT_KIB", "0"))


def _compiler_params() -> "pltpu.CompilerParams":
    if _VMEM_LIMIT_KIB:
        return pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_LIMIT_KIB * 1024)
    return pltpu.CompilerParams(has_side_effects=True)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# VMEM residency budgets (bytes): joint slab banks / solo density bank.
# Module-level so march_warp_pallas and the host-side mirror
# (stack_bank_resident) share one source of truth — and so tests can
# shrink them to force the streamed-bank paths on tiny scenes.
_BANK_BUDGET = 8 * 2 ** 20
_DENS_BUDGET = 12 * 2 ** 20


def stack_bank_resident(slab_banks, lit: bool, center: bool = False,
                        reserve_bytes: int = 0) -> bool:
    """True when the kernel keeps the slab bank(s) VMEM-resident and
    streams ZERO (or, in center mode, one mid-slab of) per-particle
    volume DMAs.  Mirrors march_warp_pallas's stack_resident AND
    dens_resident decisions: center/unlit configs qualify with just the
    DENSITY bank under the solo 12 MB budget (e.g. config 4's 12.6 MB
    bank misses the joint 8 MB cut but is density-resident).
    ``reserve_bytes``: VMEM already claimed by other resident state —
    the warp_canvas_vmem canvas (kernel.canvas_nbytes) charges here."""
    if slab_banks is None:
        return False
    dens_bytes = slab_banks[0].size * slab_banks[0].dtype.itemsize
    if (1 + lit) * dens_bytes <= _BANK_BUDGET - reserve_bytes:
        return True
    return (center or not lit) and \
        dens_bytes <= _DENS_BUDGET - reserve_bytes


def canvas_nbytes(cfg: SceneConfig, h_local) -> int:
    """Bytes of the FUSED path's canvas (canvas_geom layout) — the VMEM
    reserve a warp_canvas_vmem canvas claims from the residency budgets."""
    g = canvas_geom(cfg, h_local)
    itm = 4 if cfg.render.warp_canvas_fp32 else 2
    return g.Hc * g.Wc * itm * (1 if g.ilv else 4)


def pair_enabled(cfg: SceneConfig, n: int, use_stack: bool, lit: bool,
                 center: bool, resident: bool = True) -> bool:
    """Whether the FUSED kernel will run in paired mode (see PAIR below).
    Shared with warp._pair_swap_order so the host-side pair-aware
    composite reorder engages for exactly the same configs.
    ``resident``: VMEM-resident slab bank(s) (stack_bank_resident) —
    center/unlit pairing normally requires resident banks, EXCEPT under
    warp_canvas_vmem, whose canvas may evict the bank: the kernel then
    streams one stack block per pair member (stack_spec(i)), which the
    resident-canvas savings pay for.  Per-step lit marches (round 5)
    pair with streamed OR resident banks: their per-pair MXU-issue and
    VPU-lane savings dwarf the streaming cost (the mode was the repo's
    slowest row, DESIGN 5h#2)."""
    r = cfg.render
    from volq.render.warp import march_rect
    return (bool(r.warp_pair) and use_stack
            and (resident or bool(r.warp_canvas_vmem)
                 or (lit and not center))
            and n % 2 == 0 and march_rect(cfg) <= 96)


def march_warp_pallas(particles: Particles, volumes, camera: Camera,
                      light: Light, cfg: SceneConfig, geom,
                      light_volumes=None, slab_banks=None,
                      canvas=None, comp=None):
    """Pallas march + fan-warp.  Returns (images [N, 4, RP, RP] in the
    working dtype, shift_clamped scalar i32) — or, in FUSED mode,
    (canvas' [4, Hc, Wc], shift_clamped).

    ``slab_banks``: optional (density, light-or-None) PRE-LERPED marching
    slab banks [M, S, V, V] (render/warp.bake_march_slabs).  z0(s) and
    the z-lerp weight are STATIC per step, so the z-lerped slab each step
    reads is a fixed linear combination of two volume slices — baking it
    once per scene (per frame when animated) cuts the kernel's HBM
    traffic from V^3 to S*V^2 per particle (5.3x for config 3) and
    deletes the in-kernel z-lerp.  Bit-identical math to the in-kernel
    path (same fp32 lerp, same rounding points).

    ``canvas`` + ``comp`` (from render/warp._fused_comp_offsets) switch
    on FUSED march+composite: inputs must already be gathered into
    depth (composite) order, and instead of writing per-particle image
    blocks the epilogue RMWs each particle's canvas window in place
    (composite_chunk_pallas's double-buffered scheme: the canvas fetch
    is issued at the particle's FIRST grid step, overlapping its whole
    march; write-back overlaps the next particle's march unless their
    windows intersect).  This deletes the [N, 4, RP, RP] HBM round-trip
    and the separate composite kernel dispatch entirely."""
    r = cfg.render
    fused = canvas is not None
    # VMEM-resident canvas (warp_canvas_vmem): the whole fused canvas
    # lives in a VMEM scratch for the duration of the kernel — the
    # per-particle window fetch / write-back DMAs become ON-CHIP
    # VMEM->VMEM copies (the HBM window traffic AND its hazard stalls
    # disappear), the canvas initializes in-kernel, and ONE flush DMA
    # writes it to HBM at the last grid step.  Storage-only: the RMW
    # math, its order, and the window protocol are unchanged, so the
    # result is bit-identical to the windowed path.  The canvas bytes
    # are charged against the slab-bank residency budgets below (a
    # resident canvas can evict a resident bank back to streaming).
    RES = fused and bool(r.warp_canvas_vmem)
    res_reserve = canvas.size * canvas.dtype.itemsize if RES else 0
    if RES and res_reserve > 13 * 2 ** 20:
        raise ValueError(
            f"warp_canvas_vmem: the fused canvas is "
            f"{res_reserve / 2**20:.1f} MB — too large to keep "
            f"VMEM-resident (~13 MB budget of the 16 MB VMEM; Mosaic "
            f"fails with a clear allocation error near the line). "
            f"Shrink it with warp_coarse / warp_canvas_scale (cell "
            f"canvas) and/or warp_bands (horizontal pixel bands).")
    RP = r.warp_rect
    assert RP % 16 == 0, "warp_rect must be a multiple of 16 (bf16 tiles)"
    from volq.render.warp import march_rect, needs_row_fan, \
        upsample_weights
    RM = march_rect(cfg)
    assert RM % 16 == 0
    V = volumes.shape[-1]
    S = r.steps
    N = particles.age.shape[0]
    persp = cfg.camera.projection == "persp"
    wdt = jnp.float32 if r.warp_fp32 else jnp.bfloat16
    # fp32 mode: true-f32 MXU passes (the default is a bf16 multi-pass
    # approximation; see render/warp.py)
    prec = jax.lax.Precision.HIGHEST if r.warp_fp32 else None
    if light_volumes is not None and r.light_steps <= 0:
        # no light march requested: drop the bake so ``lit`` gates
        # identically here and in warp.py's host-side mirrors
        # (pair_enabled / stack_bank_resident use the same formula)
        light_volumes = None
    lit = light_volumes is not None
    # light_mode="center": self-shadowing samples the baked light volume
    # ONCE per ray at the particle's mid-depth step (per-ray shadow
    # gradients without per-step light work) — the march then telescopes
    # exactly like unlit, plus one tau plane captured at MID.
    center = lit and r.light_mode == "center"
    # accumulator planes: per-step lit = (P1, T) — P2 telescopes to
    # 1 - T_final, computed once in the epilogue; center = (od,
    # tau_mid); unlit = (od,) — the OVER recurrence TELESCOPES when
    # atten == 1 and the in-bounds mask is binary (1 - alpha_s =
    # exp(-msk_s * sig_s * geo) exactly), so the march accumulates ONE
    # optical-depth plane od = sum_s msk*sig and the epilogue computes
    # P2 = 1 - exp(-od * geo) once.  This deletes the per-step exp/T/fa
    # VPU work AND lets the per-step dot2s merge into one
    # [RM, U*V] x [U*V, RM] MXU contraction per grid step.
    NP = 2 if lit else 1
    MID = S // 2
    row_fan = needs_row_fan(cfg)
    K = r.warp_shift_max
    gsc = float(V - 1)
    # x-downsampled slab banks (render/warp.slab_vx_eff): the bank's
    # sublane extent VX may be < V; the WxT hat weights are then built
    # on the VX grid (gscx).  The lane (y) and z axes always stay V / S.
    VX = slab_banks[0].shape[2] if slab_banks is not None else V
    if lit and not center:
        assert VX == V, \
            "per-step lit mode requires full-x slab banks (slab_vx_eff)"
    gscx = float(VX - 1)
    W_, H_ = float(r.width), float(r.height)

    # ---- packed per-particle scalars -----------------------------------
    pos = particles.pos.astype(jnp.float32)
    half = particles.size.astype(jnp.float32)
    lo = pos - half[:, None]
    geomf = jnp.zeros((N, _GF), jnp.float32)
    geomf = geomf.at[:, _G_LOX].set(lo[:, 0])
    geomf = geomf.at[:, _G_LOY].set(lo[:, 1])
    geomf = geomf.at[:, _G_LOZ].set(lo[:, 2])
    geomf = geomf.at[:, _G_EXT].set(2.0 * half)
    geomf = geomf.at[:, _G_SCALE].set(geom["scale"])
    geomf = geomf.at[:, _G_SZN].set(geom["szn"])
    geomf = geomf.at[:, _G_VALID].set(geom["valid"].astype(jnp.float32))
    geomf = geomf.at[:, _G_ALB_R:_G_ALB_B + 1].set(
        particles.albedo.astype(jnp.float32))
    geomf = geomf.at[:, _G_SX0].set(geom["sx0"].astype(jnp.float32))
    geomf = geomf.at[:, _G_SY0].set(geom["sy0"].astype(jnp.float32))
    geomf = geomf.at[:, _G_PXC].set(geom["px_c"])
    geomf = geomf.at[:, _G_PYC].set(geom["py_c"])
    if fused:
        geomf = geomf.at[:, _G_AYF].set(comp["ayf"])
        geomf = geomf.at[:, _G_AXF].set(comp["axf"])

    # camera + light constants, replicated [1, 16] SMEM blocks
    camf = jnp.stack([
        camera.eye[0], camera.eye[1], camera.eye[2],
        camera.right[0], camera.right[1], camera.right[2],
        camera.up[0], camera.up[1], camera.up[2],
        camera.fwd[0], camera.fwd[1], camera.fwd[2],
        camera.scale_x, camera.scale_y,
        jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
    ]).astype(jnp.float32)[None]
    lightf = jnp.concatenate([jnp.asarray(light.color, jnp.float32),
                              jnp.asarray(light.ambient, jnp.float32),
                              jnp.zeros(10, jnp.float32)])[None]

    vidx = particles.vol_idx.astype(jnp.int32)
    rxu2 = geom["rx_u"]                                  # [N, RM]
    ryw2 = geom["ry_w"][..., None]                       # [N, RM, 1]

    # Volume fetch strategy, best first:
    #   1. slab_banks: ONE [S, V, V] pre-lerped block per particle
    #      (minimum possible traffic: exactly the slabs the march reads);
    #   2. full volume as ONE [V, V, V] block per particle (the kernel was
    #      DMA-ISSUE-bound with per-step slice blocks: 2U tiny DMAs per
    #      grid step, ~50k/frame on config 3);
    #   3. per-step [2, V, V] slice blocks (volumes too big for VMEM).
    use_stack = slab_banks is not None
    vol_bytes = (1 + lit) * 2 * V ** 3 * volumes.dtype.itemsize
    full_vol = (not use_stack) and vol_bytes <= 9 * 2 ** 20
    # Resident mode: when the WHOLE bank of slab stacks fits VMEM (shared
    # small banks: c1/c2/c5-class configs), its block index is constant —
    # Pallas fetches it once and per-particle volume DMA drops to ZERO.
    stack_resident = False
    dens_resident = False
    if use_stack:
        Ms = slab_banks[0].shape[0]
        dens_bytes = slab_banks[0].size * slab_banks[0].dtype.itemsize
        bank_bytes = (1 + lit) * dens_bytes
        stack_resident = bank_bytes <= _BANK_BUDGET - res_reserve
        if not stack_resident and (center or not lit):
            # center/unlit only need the DENSITY bank resident (center
            # streams one light mid-slab per particle), so it gets a
            # solo, larger VMEM budget — e.g. config 4's 12.6 MB bank
            # just misses the joint 8 MB cut and would otherwise
            # re-stream ~800 MB/frame of slabs in depth order.  A
            # VMEM-resident canvas (RES) charges its bytes here first:
            # the canvas windows it deletes outweigh the slab re-stream
            # it brings back (which overlaps the march).
            dens_resident = dens_bytes <= _DENS_BUDGET - res_reserve

    # Unroll U march steps per grid step: amortizes the fixed per-grid-step
    # cost (block bookkeeping, predicates) over more MXU work.  Measured
    # on c3: ~290 ns fixed per grid step (U=2 cut 3.5 ms off the frame).
    # VMEM budget caps the unroll: accumulators/geometry scale with RP^2
    # and each unrolled step double-buffers two [V, V] slab blocks —
    # EXCEPT in slab-stack mode, whose per-particle block is U-independent
    # (the cap is then code size + the Mosaic temporaries stack; S <= 32
    # unrolls fully in bf16, but fp32 temporaries are 2x and blow the
    # 16M scoped-vmem stack at RP=224 — cap fp32 at 8).
    # ---- particle pairing (warp_pair): march TWO depth-consecutive
    # particles per grid step.  The per-step dot1 packs both into one
    # [2RM, 2V]-weight matmul (block-structured: q's hat positions are
    # offset by +V onto lanes V..2V-1, so the off-diagonal blocks are
    # EXACT zeros and each particle's t1 rows accumulate the same fp32
    # values as unpaired — adding exact zeros never rounds), and the
    # merged dot2 becomes [2RM, U*VX] x [U*VX, 2RM] with the two WxT
    # halves lane-concatenated.  Full-width MXU tiles (the RM = V = 64
    # configs ran far under peak on half-empty 128-tiles) AND half the
    # fixed per-grid-step cost.  Bit-identical to unpaired; slab-bank
    # fused configs with even N only.  Per-step lit marches (round 5)
    # pair too: one [MR, 2V] x [2V, 2V] dot1 over both members'
    # density + light slabs and full-lane [MR, MR] recurrence planes
    # (the LITP branch in _march_pair).
    PAIR = fused and pair_enabled(cfg, N, use_stack, lit, center,
                                  resident=(stack_resident
                                            or dens_resident))
    PW = 2 if PAIR else 1
    N2 = N // PW
    MR = PW * RM
    # (A CHB-batched per-particle gf/rxu/ryw fetch and a resident light
    # mid-slab bank were both measured a WASH here — Pallas block
    # pipelining already hides the small per-particle DMAs; see
    # bench/ladders/r5_dma_ab.json — so neither ships.)

    if use_stack and S <= 32:
        u_cap = S if (not r.warp_fp32 or RP <= 160) else 8
    else:
        u_cap = 8 if RP <= 160 else (4 if RP <= 224 else 2)
    if PAIR:
        # paired march temporaries scale with the unroll: each unrolled
        # step materializes t1 [MR, VX] plus the merged-dot2 operands /
        # product (~[MR, MR]) on Mosaic's 16 MB scoped-vmem stack.  Cap
        # the unroll from an explicit bytes estimate (double-buffer
        # factor 2, 6 MB budget — conservative vs the 16 MB stack;
        # reproduces the shipped presets' full unroll) so configs with
        # larger RM/VX/S degrade to a smaller unroll instead of failing
        # to compile.
        itm = 4 if r.warp_fp32 else 2
        pair_step_bytes = MR * (VX + MR) * itm * 2
        u_cap = min(u_cap, max((6 * 2 ** 20) // pair_step_bytes, 1))
    if _FORCE_UCAP:
        u_cap = min(u_cap, _FORCE_UCAP)
    U = next(u for u in (S, 16, 12, 8, 6, 4, 3, 2, 1)
             if S % u == 0 and u <= u_cap)
    SG = S // U

    # ---- grid packing (warp_pack, DESIGN 5k): QP pairs per entry ----
    # The round-5 floor sweep (bench/ladders/r5_floor_sweep.json)
    # measured the fused kernel's per-grid-entry machinery at ~2 us per
    # pair — the WHOLE c4 floor (the body-deleted kernel times the same
    # as the runtime floor) — so fewer, fatter entries is the direct
    # lever: a packed entry runs QP consecutive pairs back-to-back
    # (bit-identical math, window protocol, and compositing order; the
    # pairs execute in exactly the order consecutive grid entries used
    # to) and pays the grid-sequencing + per-n block-transition cost
    # once.  Fused slab-bank single-grid-row (SG == 1) marches only —
    # every production preset; other shapes keep QP = 1.
    QP = max(int(r.warp_pack), 1)
    if not (fused and use_stack and SG == 1):
        QP = 1
    while QP > 1 and N2 % QP:
        QP //= 2

    def z0_of(s):
        zeta = (s.astype(jnp.float32) + 0.5) / S
        return jnp.clip(jnp.floor(zeta * gsc), 0, V - 2).astype(jnp.int32)

    def s_eff(s_raw, flipped):
        """Per-particle marching order: rays with szn < 0 see the z planes
        back-to-front, so the step sequence is REVERSED for them (via the
        prefetched flip flag) and a single front-to-back accumulator
        suffices — no dual Cf/Cb, no final select."""
        return jnp.where(flipped == 1, S - 1 - s_raw, s_raw)

    if fused:
        # canvas geometry (canvas_geom): window dims in ARRAY units,
        # coarse (march-cell canvas) and ilv (channel-interleaved lanes)
        # layout flags.  The window splits into an ALWAYS-copied A half
        # and a CONDITIONAL B half: a particle's placement only reaches
        # columns >= WWA for large sub-granule offsets (the prefetched
        # ``wide`` flag), so most particles skip the B half's canvas
        # DMAs, placement matmul, and RMW entirely (Mosaic requires
        # 128-aligned lane slice shapes, so the split point is a
        # 128-multiple).
        cg = comp["cg"]
        WH, WW, WWA = cg.WH, cg.WW, cg.WWA
        WWB = WW - WWA
        ILV = bool(cg.ilv)
        COARSE = bool(cg.coarse)
        # CELLS: the canvas axes are cells (1/cg.ratio px) rather than
        # pixels — warp_coarse (cells = march cells) or the generalized
        # warp_canvas_scale (arbitrary scale); placement maps canvas
        # cells to march cells by the static C2M factor (exactly 1.0 in
        # coarse mode, where x * 1.0 is bit-exact)
        CELLS = COARSE or cg.ratio != 1.0
        C2M = float(np.float32((RM - 1) / max(RP - 1, 1))
                    / np.float32(cg.ratio))
        cdt = canvas.dtype
        Hc_, Wc_ = cg.Hc, cg.Wc

    def kernel(vidx_ref, flip_ref, vld_ref, *rest):
        if fused:
            oy_ref, ox_ref, dy_ref, dx_ref, ov_ref, wide_ref = rest[:6]
            rest = rest[6:]
        if use_stack:
            if stack_resident or dens_resident:
                vol_stack = rest[0]
                rest = rest[1:]
                vol_stacks = [vol_stack] * (QP * PW)
            else:
                # streamed per-particle stacks: QP*PW block inputs
                vol_stacks = list(rest[:QP * PW])
                vol_stack = vol_stacks[0]
                rest = rest[QP * PW:]
            if lit:
                if center and not stack_resident:
                    # streamed mid-slab(s): QP*PW block inputs
                    lvol_mids = list(rest[:QP * PW])
                    lvol_stack = lvol_mids[0]
                    rest = rest[QP * PW:]
                elif stack_resident:
                    lvol_stack = rest[0]
                    lvol_stacks = [lvol_stack] * (QP * PW)
                    rest = rest[1:]
                else:
                    # streamed per-particle light stacks (per-step lit)
                    lvol_stacks = list(rest[:QP * PW])
                    lvol_stack = lvol_stacks[0]
                    rest = rest[QP * PW:]
        elif full_vol:
            vol_full = rest[0]
            rest = rest[1:]
            if lit:
                lvol_full = rest[0]
                rest = rest[1:]
        else:
            vols_in = rest[:2 * U]
            rest = rest[2 * U:]
            if lit:
                lvols_in = rest[:2 * U]
                rest = rest[2 * U:]
        if RM != RP and not fused:
            # the constant upsample weights follow the camera/light
            # constants in the input order (fused builds its PLACED
            # upsample weights in-kernel instead)
            uy_r, ux_r = rest[5], rest[6]
            rest = rest[:5] + rest[7:]
        if fused and RES:
            # resident mode: no canvas input (the scratch initializes
            # in-kernel); cvs is the VMEM-resident canvas, canvas_out
            # only receives the final flush DMA
            (gf, rxu, ryw, camf_r, lightf_r, canvas_out,
             clamp_out, acc, geo, win, sem_in, sem_out,
             semB_in, semB_out, cvs, sem_flush) = rest
        elif fused:
            (gf, rxu, ryw, camf_r, lightf_r, canvas_in, canvas_out,
             clamp_out, acc, geo, win, sem_in, sem_out,
             semB_in, semB_out) = rest
        else:
            (gf, rxu, ryw, camf_r, lightf_r, img_out, clamp_out,
             acc, geo) = rest
        ng = pl.program_id(0)
        s = pl.program_id(1)
        if _abl("body"):
            # grid + block specs ONLY: the whole body is never traced.
            # Pallas still runs the spec-driven fetch pipeline, so this
            # arm prices pure grid-entry + DMA machinery with zero
            # kernel-side scalar/vector work (DESIGN 5j discriminator).
            return


        def _pair_iter(nv, jo):
            """One pair's complete body: init + window fetch + march +
            epilogue.  At QP == 1 this is called once with
            nv == program_id(0), jo == 0 — the shipped trace,
            unchanged.  At QP > 1 (warp_pack, DESIGN 5k) QP
            consecutive pairs share one grid entry: the pairs run
            sequentially in trace order exactly as consecutive grid
            entries used to (same math, same window-DMA protocol and
            semaphore pairing, same compositing order — bit-identical
            canvas), while the grid-sequencing and per-n
            block-transition machinery is paid once per QP pairs.
            ``nv`` is the VIRTUAL pair index; ``jo`` this pair's row
            offset inside the entry's packed per-n blocks."""
            n = nv
            def gfs(i_, col):
                """Per-particle f32 scalar (pair member i_) from the geomf
                SMEM block (jo = this pair's row offset in the packed
                per-n block; 0 at QP == 1)."""
                return gf[jo + i_, 0, col]

            if fused:
                # particle index k and window-buffer parity b: unpaired,
                # k = n and b alternates with n; paired, the pair members
                # (k = 2n, 2n+1) always use buffers (0, 1) — the SAME
                # per-particle reuse/overlap semaphore protocol holds in
                # both cases (b == k mod 2 either way)
                b = jnp.int32(0) if PAIR else jax.lax.rem(n, 2)

                def win_yx(k):
                    return (pl.multiple_of(oy_ref[k], 8),
                            pl.multiple_of(ox_ref[k], 128))

                def _win_slice(bb, off, wwn):
                    return (win.at[bb, :, pl.ds(off, wwn)] if ILV
                            else win.at[bb, :, :, pl.ds(off, wwn)])

                # RES: the window copies' far end is the VMEM-resident
                # canvas (on-chip VMEM->VMEM DMAs) instead of HBM
                cref = cvs if RES else canvas_out

                def _canvas_slice(y_, x_, wwn):
                    return (cref.at[pl.ds(y_, WH), pl.ds(x_, wwn)]
                            if ILV else
                            cref.at[:, pl.ds(y_, WH), pl.ds(x_, wwn)])

                if RES:
                    @pl.when((n == 0) & (s == 0))
                    def _cvs_init():
                        # in-kernel canvas init (C = 0, T = 1; interleaved:
                        # T on phase-3 lanes) — replaces the host-side
                        # canvas_init_pallas array, which RES mode never
                        # reads (XLA DCEs its construction)
                        if ILV:
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, (Hc_, Wc_), 1)
                            cvs[...] = jnp.where(
                                lane - (lane // 4) * 4 == 3, 1.0, 0.0) \
                                .astype(cdt)
                        else:
                            cvs[0:3] = jnp.zeros((3, Hc_, Wc_), cdt)
                            cvs[3:4] = jnp.ones((1, Hc_, Wc_), cdt)

                def coutA_desc(k, bb):
                    y_, x_ = win_yx(k)
                    return pltpu.make_async_copy(
                        _win_slice(bb, 0, WWA), _canvas_slice(y_, x_, WWA),
                        sem_out.at[bb])

                def cinA_desc(k, bb):
                    y_, x_ = win_yx(k)
                    return pltpu.make_async_copy(
                        _canvas_slice(y_, x_, WWA), _win_slice(bb, 0, WWA),
                        sem_in.at[bb])

                def fetch_seq(k, bb):
                    """The per-particle window-fetch protocol (identical to
                    the sequential round-2 scheme): wait the write-back that
                    last used this buffer (k-2; skipped if k-1's overlap
                    guard already consumed it), wait the previous particle's
                    write-back when the windows intersect, then start the
                    fetch.  In paired mode the protocol is unchanged — only
                    q's ISSUE POINT moves to the epilogue when it overlaps
                    its own pair partner (ov[k]==1), which also makes its
                    overlap wait see p's just-started write-back."""
                    if _abl("windma"):   # skip ALL window DMAs (the
                        return                # pure window-traffic bound)
                    @pl.when((k >= 2) & (ov_ref[jnp.maximum(k - 1, 0)] == 0))
                    def _wait_reuse():
                        coutA_desc(k, bb).wait()

                    @pl.when(ov_ref[k] == 1)
                    def _wait_overlap():
                        coutA_desc(k, 1 - bb).wait()

                    cinA_desc(k, bb).start()

                if WWB:
                    # B-half copies are SYNCHRONOUS inside the wide-only
                    # epilogue block (started and waited there), so no
                    # cross-particle semaphore pairing exists for them —
                    # wide particles are the rare case and pay ~0.5 us each
                    def coutB_desc(k, bb):
                        y_, x_ = win_yx(k)
                        xb_ = pl.multiple_of(x_ + WWA, 128)
                        return pltpu.make_async_copy(
                            _win_slice(bb, WWA, WWB),
                            _canvas_slice(y_, xb_, WWB), semB_out)

                    def cinB_desc(k, bb):
                        y_, x_ = win_yx(k)
                        xb_ = pl.multiple_of(x_ + WWA, 128)
                        return pltpu.make_async_copy(
                            _canvas_slice(y_, xb_, WWB),
                            _win_slice(bb, WWA, WWB), semB_in)

            def pread(i_):
                """Per-particle scalars + ray vectors (pair member i_; the
                unpaired path binds pread(0) at top level)."""
                return (gfs(i_, _G_LOX), gfs(i_, _G_LOY),
                        gfs(i_, _G_LOZ), gfs(i_, _G_EXT),
                        gfs(i_, _G_SCALE), gfs(i_, _G_SZN),
                        gfs(i_, _G_VALID), rxu[jo + i_], ryw[jo + i_])

            (lo_x, lo_y, lo_z, ext, scale, szn, vld,
             rx_row, ry_col) = pread(0)                 # [1, RP] / [RP, 1]
            eye_x, eye_y, eye_z = camf_r[0, 0], camf_r[0, 1], camf_r[0, 2]
            fwd_x, fwd_y, fwd_z = camf_r[0, 9], camf_r[0, 10], camf_r[0, 11]

            if not persp:
                fz_s = jnp.where(jnp.abs(fwd_z) < _EPS,
                                 jnp.where(fwd_z >= 0, _EPS, -_EPS), fwd_z)
                kx = fwd_x / fz_s
                ky = fwd_y / fz_s

            # paired telescoped marches are always ascending; the paired
            # per-step lit march reads its per-MEMBER flip flags inside
            # _march_pair (the OVER recurrence is order-sensitive)
            flipped = jnp.int32(0) if PAIR else flip_ref[n]
            if use_stack and (stack_resident or dens_resident):
                vids = [vidx_ref[n * PW + i_] for i_ in range(PW)]
                vid = vids[0]

            def _init_one(i_):
                (lo_x, lo_y, lo_z, ext, scale, szn, vld,
                 rx_row, ry_col) = pread(i_)
                z2 = jnp.zeros((RM, RM), jnp.float32)
                if _abl("init"):     # skip the ray/AABB divide+sqrt chains
                    geo[i_] = scale * (rx_row * 1e-6 + ry_col * 1e-6 + z2)
                    return
                if persp:
                    rnorm = jnp.sqrt(rx_row * rx_row + ry_col * ry_col + 1.0)
                    inv_n = 1.0 / rnorm
                    d_x = rx_row * inv_n * szn
                    d_y = ry_col * inv_n * szn
                    d_z = inv_n * szn
                    o_x, o_y, o_z = eye_x + z2, eye_y + z2, eye_z + z2
                    dt_raw = (ext / S) * rnorm
                else:
                    o_x = rx_row + eye_z * kx + z2
                    o_y = ry_col + eye_z * ky + z2
                    o_z = eye_z + z2
                    d_x = fwd_x + z2
                    d_y = fwd_y + z2
                    d_z = fwd_z + z2
                    dt_raw = ext / S / jnp.abs(fz_s) + z2

                def axis_seg(o, d, lo1, hi1):
                    sgn = jnp.where(d >= 0, 1.0, -1.0)
                    dsafe = jnp.where(jnp.abs(d) < 1e-12, sgn * 1e-12, d)
                    inv = 1.0 / dsafe
                    ta = (lo1 - o) * inv
                    tb = (hi1 - o) * inv
                    return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

                t0x, t1x = axis_seg(o_x, d_x + z2, lo_x, lo_x + ext)
                t0y, t1y = axis_seg(o_y, d_y + z2, lo_y, lo_y + ext)
                t0z, t1z = axis_seg(o_z, d_z, lo_z, lo_z + ext)
                t0 = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
                t1 = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
                seg = jnp.maximum(t1 - t0, 0.0)
                geo[i_] = scale * jnp.minimum(dt_raw, seg)   # scale * dt

            @pl.when(s == 0)
            def _init():
                # factored accumulators: the per-step color is col_ch =
                # alb_ch * (lcol_ch * atten + amb_ch), LINEAR in (atten, 1) —
                # so only scalar-weight planes accumulate (P1 = sum fa*atten,
                # P2 = sum fa, T) and the RGB expansion happens once in the
                # epilogue (after the fan warp: fewer planes to shift).
                acc[:] = jnp.zeros((NP, MR, MR), jnp.float32)
                if lit and not center:
                    acc[NP - 1] = jnp.ones((MR, MR), jnp.float32)
                for i_ in range(PW):
                    _init_one(i_)

            if fused:
                # canvas window fetch, issued at the particle's FIRST grid
                # step so it overlaps the whole march (fetch_seq: the
                # sequential reuse/overlap protocol).  Paired: q's fetch is
                # prefetched here ONLY when it does not overlap its own pair
                # partner p (ov[k1]==0); otherwise it is deferred to the
                # epilogue, after p's write-back starts (fetching it here
                # would deadlock: the overlap wait would target a write-back
                # this same grid step hasn't issued yet).
                @pl.when(s == 0)
                def _fused_fetch():
                    fetch_seq(n * PW, b)
                    if PAIR:
                        @pl.when(ov_ref[n * PW + 1] == 0)
                        def _prefetch_q():
                            fetch_seq(n * PW + 1, jnp.int32(1))

            # ---- marching steps (U unrolled per grid step) -------------------
            # rows that are invalid (dead/culled, or the other size class in
            # two-class rendering) skip the whole marching body: acc stays at
            # the OVER identity set by _init.  Paired: run if EITHER member
            # is valid (the invalid one's weights are masked to zero).
            # (_abl("march"): statically skip the WHOLE march body —
            # weights, coords, dots, slab reads — leaving epilogue + DMAs)
            vld_any = vld if PW == 1 else (vld + pread(1)[6])

            def _march_pair():
                # Paired telescoped march (see the PAIR comment above): both
                # members' dot operands pack into full-width MXU tiles.
                # The lane axis holds BOTH voxel grids (vox2 repeats 0..V-1
                # twice — adding +V to the hat POSITIONS instead would round
                # away fraction bits when the sum crosses a binade), and a
                # static 0/1 block mask zeroes the off-diagonal blocks; x1
                # and x0 are exact, so each diagonal block accumulates
                # bit-identically to the unpaired march.  The -2 sentinel
                # keeps masked/invalid rows at zero weight on every lane.
                iot_c2 = jax.lax.broadcasted_iota(
                    jnp.int32, (MR, 2 * V), 1)
                row_i2 = jax.lax.broadcasted_iota(
                    jnp.int32, (MR, 2 * V), 0)
                vox2 = (iot_c2 - jnp.where(iot_c2 >= V, V, 0)) \
                    .astype(jnp.float32)                    # 0..V-1 twice
                blkmask = (((iot_c2 >= V) == (row_i2 >= RM))
                           .astype(jnp.float32))            # diag blocks
                iot_a2 = jax.lax.broadcasted_iota(
                    jnp.int32, (VX, MR), 0).astype(jnp.float32)
                pv = [pread(i_) for i_ in range(PW)]
                LITP = lit and not center   # per-step lit, paired (round 5)
                if LITP:
                    # per-member march DIRECTION: the OVER recurrence is
                    # order-sensitive, so each member honors its own
                    # prefetched flip flag (telescoped modes are order-free
                    # and always march ascending)
                    flips = [flip_ref[n * PW + i_] for i_ in range(PW)]
                    # block-assembled per-ray scale*dt plane and per-member
                    # scale*ext rows: the diagonal [RM, RM] blocks carry
                    # exactly the unpaired values (off-diagonal blocks are
                    # the packing's discarded cross terms, finite by
                    # construction — hats <= 1, slabs bounded)
                    geo2 = jnp.concatenate(
                        [jnp.concatenate([geo[i_]] * PW, axis=1)
                         for i_ in range(PW)], axis=0)           # [MR, MR]
                    se2 = jnp.concatenate(
                        [jnp.broadcast_to(pv[i_][4] * pv[i_][3], (RM, 1))
                         for i_ in range(PW)], axis=0)           # [MR, 1]
                hoist = []
                for (lo_x, lo_y, lo_z, ext, scale, szn, vldi,
                     rx_row, ry_col) in pv:
                    kx2 = gscx / ext
                    ky2 = gsc / ext
                    if persp:
                        hoist.append((kx2, ky2, (eye_x - lo_x) * kx2,
                                      (eye_y - lo_y) * ky2))
                    else:
                        hoist.append((kx2, ky2, kx2 * rx_row, ky2 * ry_col))
                y_parts, x_parts = [], []
                for u in range(U):
                    su = jnp.int32(s * U + u)
                    # telescoped modes march ascending for every member
                    # (order-free sums); per-step lit flips per member
                    sei_m = ([s_eff(su, flips[i_]) for i_ in range(PW)]
                             if LITP else [su] * PW)
                    sei = sei_m[0]
                    gy_sel, gx_sel = [], []
                    for i_ in range(PW):
                        (lo_x, lo_y, lo_z, ext, scale, szn, vldi,
                         rx_row, ry_col) = pv[i_]
                        kx2, ky2, hx, hy = hoist[i_]
                        zeta = (sei_m[i_].astype(jnp.float32) + 0.5) / S
                        zw = lo_z + zeta * ext
                        if persp:
                            c1 = zw - eye_z
                            gx = hx + (c1 * kx2) * rx_row
                            gy = hy + (c1 * ky2) * ry_col
                        else:
                            gx = (zw * kx - lo_x) * kx2 + hx
                            gy = (zw * ky - lo_y) * ky2 + hy
                        tp = ((zw - eye_z) * szn > 0) & (vldi > 0)
                        gy_sel.append(jnp.where(
                            ((gy >= 0) & (gy <= gsc)) & tp, gy, -2.0))
                        gx_sel.append(jnp.where(
                            ((gx >= 0) & (gx <= gscx)) & (vldi > 0),
                            gx, -2.0))
                    gsel_y = jnp.concatenate(gy_sel, axis=0)     # [MR, 1]
                    gsel_x = jnp.concatenate(gx_sel, axis=1)     # [1, MR]
                    # blkmask folds into the hat's peak: on diagonal blocks
                    # max(0, 1 - |d|) (blkmask == 1.0, the same subtraction
                    # as the explicit form), off-diagonal max(0, 0 - |d|)
                    # == +0 exactly (== 0.0 * hat) — one fewer [MR, 2V] VPU
                    # op per unrolled step, bit-identical values
                    Wy = jnp.maximum(0.0, blkmask - jnp.abs(gsel_y - vox2)) \
                        .astype(wdt)                             # [MR, 2V]
                    WxT = jnp.maximum(0.0, 1.0 - jnp.abs(iot_a2 - gsel_x)) \
                        .astype(wdt)                             # [VX, MR]
                    if _abl("weights"):
                        Wy = (vox2 * 0.001).astype(wdt)
                        WxT = (iot_a2 * 0.001).astype(wdt)

                    def pslab(i_, si):
                        if stack_resident or dens_resident:
                            return vol_stack[pl.ds(vids[i_] * S + si,
                                                   1)][0]
                        return vol_stacks[jo + i_][0, pl.ds(si, 1)][0]

                    if LITP:
                        # per-step lit, paired: ONE [MR, 2V] x [2V, 2V]
                        # dot1 over both members' density AND light slabs
                        # (a-axis rows 0..V-1 density, V..2V-1 light; the
                        # lane blkmask zeroes cross-member terms with exact
                        # +0s, so each diagonal block accumulates the
                        # unpaired values bit-for-bit), then per-step sig /
                        # tau dot2s and the P1/T OVER recurrence on the
                        # full-lane [MR, MR] planes — 3 MXU issues per pair
                        # step where unpaired paid 6, and every VPU op in
                        # the recurrence runs at full vreg width.
                        def plslab(i_, si):
                            if stack_resident:
                                return lvol_stack[pl.ds(vids[i_] * S + si,
                                                        1)][0]
                            return lvol_stacks[jo + i_][0, pl.ds(si, 1)][0]

                        slab2 = jnp.concatenate(
                            [jnp.concatenate([pslab(0, sei_m[0]),
                                              pslab(1, sei_m[1])], axis=1),
                             jnp.concatenate([plslab(0, sei_m[0]),
                                              plslab(1, sei_m[1])],
                                             axis=1)], axis=0)   # [2V, 2V]
                        t1_ = jax.lax.dot_general(
                            Wy, slab2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)                      # [MR, 2V]
                        t1w = t1_.astype(wdt)
                        sig = jax.lax.dot_general(
                            t1w[:, :V], WxT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)                      # [MR, MR]
                        tau = jax.lax.dot_general(
                            t1w[:, V:], WxT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
                        # same expressions (and rounding points) as the
                        # unpaired per-step recurrence; P2 telescopes to
                        # 1 - T in the epilogue exactly as unpaired
                        alpha = 1.0 - jnp.exp(-sig * geo2)
                        atten = jnp.exp(-se2 * jnp.maximum(tau, 0.0))
                        T = acc[1]
                        fa = T * alpha
                        acc[0] = acc[0] + fa * atten
                        acc[1] = T - fa
                        continue

                    slab_cat = jnp.concatenate([pslab(0, sei),
                                                pslab(1, sei)],
                                               axis=1)           # [VX, 2V]
                    if _abl("dot1") and VX == V:
                        t1_ = Wy[:, :VX] * (1.0 + slab_cat[:1, :VX])
                    else:
                        t1_ = jax.lax.dot_general(
                            Wy, slab_cat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)                      # [MR, VX]
                    y_parts.append(t1_.astype(wdt))
                    x_parts.append(WxT)

                    if center and u == MID % U:
                        @pl.when(s == MID // U)
                        def _tau_mid(Wy=Wy, WxT=WxT, sei=sei):
                            def pmid(i_):
                                if stack_resident:
                                    return lvol_stack[
                                        pl.ds(vids[i_] * S + sei, 1)][0]
                                return lvol_mids[jo + i_][0, 0]
                            ls_cat = jnp.concatenate([pmid(0), pmid(1)],
                                                     axis=1)
                            t1l = jax.lax.dot_general(
                                Wy, ls_cat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
                            acc[1] = jax.lax.dot_general(
                                t1l.astype(wdt), WxT,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)

                if LITP:
                    return   # per-step recurrence already accumulated
                if _abl("dot2"):
                    od = sum(p[:, :1] * 0.001 for p in y_parts) \
                        + x_parts[0][:1, :] * 0.0
                else:
                    od = jax.lax.dot_general(
                        jnp.concatenate(y_parts, axis=1) if U > 1
                        else y_parts[0],
                        jnp.concatenate(x_parts, axis=0) if U > 1
                        else x_parts[0],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                acc[0] = acc[0] + od

            # "march" skips the body at RUNTIME (compiled but branch-false);
            # "marchoff" removes it STATICALLY (never traced) — the pair
            # discriminates whether compiled-but-skipped code costs per-step
            # time (instruction streaming) or only the work itself does.
            @pl.when((vld_any > 0) if not _abl("march") else (vld_any > 127))
            def _march_steps():
              if _abl("marchoff"):
                  acc[0] = acc[0] + 1e-6
                  return
              if PAIR:
                  _march_pair()
                  return
              # loop-invariant hat-weight iotas, built once per grid step
              iot_b = jax.lax.broadcasted_iota(
                  jnp.int32, (RM, V), 1).astype(jnp.float32)
              iot_a = jax.lax.broadcasted_iota(
                  jnp.int32, (VX, RM), 0).astype(jnp.float32)
              # hoisted grid-coord factors: gx = bx + (c1*kx2)*rx (persp)
              # or ax_s + rxk (ortho) — ONE wide fma/add per axis per step
              # instead of the 5-op chain (incl. a per-step DIVIDE); the
              # oracle and the XLA march mirror the same association
              kx2 = gscx / ext
              ky2 = gsc / ext
              if persp:
                  bx_h = (eye_x - lo_x) * kx2
                  by_h = (eye_y - lo_y) * ky2
              else:
                  rxk = kx2 * rx_row
                  ryk = ky2 * ry_col
              y_parts, x_parts = [], []
              for u in range(U):
                sei = s_eff(jnp.int32(s * U + u), flipped)
                se = sei.astype(jnp.float32)
                zeta = (se + 0.5) / S
                gz = zeta * gsc
                if not use_stack:
                    z0f = jnp.clip(jnp.floor(gz), 0.0, V - 2.0)
                    fz_lerp = jnp.clip(gz - z0f, 0.0, 1.0)
                zw = lo_z + zeta * ext
                if _abl("gxy"):
                    # constant-ish grid coords (keep the step + ray-vector
                    # dependency with ONE fma per axis): measures the
                    # per-step coord chains (fma/div/scale per axis)
                    gx = rx_row + se
                    gy = ry_col + se
                elif persp:
                    c1 = zw - eye_z
                    gx = bx_h + (c1 * kx2) * rx_row                   # [1, RP]
                    gy = by_h + (c1 * ky2) * ry_col                   # [RP, 1]
                else:
                    gx = (zw * kx - lo_x) * kx2 + rxk
                    gy = (zw * ky - lo_y) * ky2 + ryk
                # the ray-origin plane is z = eye_z for BOTH projections, so
                # the t>0 test is a scalar folded into the row mask; vld > 0
                # is already guaranteed by the enclosing pl.when
                tpos = (zw - eye_z) * szn > 0
                # EVERY mode folds the binary in-bounds mask into the hat
                # weights EXACTLY — msk * (Wy @ slab @ Wx) ==
                # (iny*Wy) @ slab @ (Wx*inx) for {0,1} row/col masks —
                # and the fold happens in the 1-D POSITIONS: a masked
                # row/col gets hat position -2, whose hat weight is
                # exactly 0.0 for every voxel (|−2−v| >= 2), deleting
                # two [RM, V] mask multiplies per step
                # (no clip inside the select: the mask already implies
                # gy in [0, gsc], so clip is the identity — bit-exact).
                # Per-step lit included (round 5): a masked row/col gets
                # sig == +0 exactly, so alpha = 1 - exp(-0·dt) = +0 — the
                # same exact zero the explicit msk multiply produced (its
                # tau differs out-of-bounds, but fa == 0 multiplies atten
                # out of the accumulators bit-exactly), deleting the
                # msk/iny/inx builds, two clips, and the [RP, RP] mask
                # multiply from the march-lit step.
                gyc = jnp.where(((gy >= 0) & (gy <= gsc)) & tpos,
                                gy, -2.0)
                gxc = jnp.where((gx >= 0) & (gx <= gscx),
                                gx, -2.0)
                Wy = jnp.maximum(0.0, 1.0 - jnp.abs(gyc - iot_b)) \
                    .astype(wdt)                                     # [RP, V(b)]
                WxT = jnp.maximum(0.0, 1.0 - jnp.abs(iot_a - gxc)) \
                    .astype(wdt)                                     # [V(a), RP]
                if _abl("weights"):       # constant weights, keep dots
                    Wy = (iot_b * 0.001).astype(wdt)
                    WxT = (iot_a * 0.001).astype(wdt)

                if use_stack:
                    if stack_resident or dens_resident:
                        def stacked(ref):
                            # bank flattened to [M*S, V, V]; one dynamic
                            # leading index (vid*S + sei)
                            return ref[pl.ds(vid * S + sei, 1)][0]
                    else:
                        def stacked(ref):
                            return ref[0, pl.ds(sei, 1)][0]          # [V,V] wdt
                elif full_vol:
                    z0i = jnp.clip(jnp.floor(gz), 0.0,
                                   V - 2.0).astype(jnp.int32)

                    def lerped_ref(ref):
                        sl = ref[0, pl.ds(z0i, 2)]                   # [2,V,V]
                        a = sl[0].astype(jnp.float32)
                        b = sl[1].astype(jnp.float32)
                        return (a + (b - a) * fz_lerp).astype(wdt)

                def lerped(s0, s1):
                    a = s0[0, 0].astype(jnp.float32)
                    b = s1[0, 0].astype(jnp.float32)
                    return (a + (b - a) * fz_lerp).astype(wdt)       # [V,V]

                def contract(slab_cat, n_banks):
                    """sigma for 1-2 banks whose slabs are concatenated on
                    the a (x) axis: dot1 N-widens to n_banks*V — same math
                    and rounding points as separate pairs, bigger MXU tiles
                    (the V=64 configs were MXU-bound on half-empty tiles).
                    Returns a list of [RP, RP] per bank.  (Merging the two
                    dot2s into one [nb*RP, V] dot does NOT lower: Mosaic
                    rejects re-concatenating lane-offset slices on the
                    sublane axis — "offset mismatch on non-concat dim".)"""
                    t1_ = jax.lax.dot_general(
                        Wy, slab_cat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)                      # [RP, nb*V(a)]
                    t1w = t1_.astype(wdt)
                    return [jax.lax.dot_general(
                        t1w[:, k * V:(k + 1) * V], WxT,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                        for k in range(n_banks)]

                if lit and not center:
                    if use_stack:
                        slab_cat = jnp.concatenate(
                            [stacked(vol_stacks[jo]),
                             stacked(lvol_stacks[jo])], axis=0)
                    elif full_vol:
                        slab_cat = jnp.concatenate(
                            [lerped_ref(vol_full), lerped_ref(lvol_full)],
                            axis=0)                          # [2V(a'), V(b)]
                    else:
                        slab_cat = jnp.concatenate(
                            [lerped(vols_in[2 * u], vols_in[2 * u + 1]),
                             lerped(lvols_in[2 * u], lvols_in[2 * u + 1])],
                            axis=0)
                    sig, tau = contract(slab_cat, 2)
                    # P2 telescopes (sum_s T_s*alpha_s = 1 - T_final, the
                    # oracle's own factored form, warp_cpu.py): only P1 and
                    # T accumulate per step — one fewer [RP, RP] add per
                    # step and one fewer [MR, MR] f32 VMEM plane; the
                    # epilogue reconstitutes P2 = 1 - T before the fan
                    alpha = 1.0 - jnp.exp(-sig * geo[0])
                    atten = jnp.exp(-(scale * ext) * jnp.maximum(tau, 0.0))
                    T = acc[1]
                    fa = T * alpha
                    acc[0] = acc[0] + fa * atten
                    acc[1] = T - fa
                else:
                    # telescoped: only dot1 per step; the (t1, WxT) factors
                    # are collected and contracted ONCE per grid step below
                    if use_stack:
                        slab = stacked(vol_stacks[jo])
                    elif full_vol:
                        slab = lerped_ref(vol_full)
                    else:
                        slab = lerped(vols_in[2 * u], vols_in[2 * u + 1])
                    if _abl("dot1") and VX == V:
                        # skip dot1, keep weights+dot2 (sublane-only
                        # broadcast: 2-D broadcasts of a [1,1] scalar slice
                        # don't lower).  With x-downsampled banks (VX < V)
                        # no cheap [RM, VX] stand-in exists — the real dot1
                        # stays and this ablation measures nothing.
                        t1_ = Wy * (1.0 + slab[:1, :])
                    else:
                        t1_ = jax.lax.dot_general(
                            Wy, slab, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)                  # [RP, V(a)]
                    y_parts.append(t1_.astype(wdt))
                    x_parts.append(WxT)

                    if center and u == MID % U:
                        # ONE light sample per ray, at the particle's
                        # mid-depth step (masked weights -> tau = 0 out of
                        # bounds, i.e. atten = 1 where P2 = 0 anyway)
                        @pl.when(s == MID // U)
                        def _tau_mid(Wy=Wy, WxT=WxT):
                            if use_stack:
                                if stack_resident:
                                    ls = stacked(lvol_stacks[jo])
                                else:
                                    ls = lvol_mids[jo][0, 0]  # mid-slab block
                            elif full_vol:
                                ls = lerped_ref(lvol_full)
                            else:
                                ls = lerped(lvols_in[2 * u],
                                            lvols_in[2 * u + 1])
                            t1l = jax.lax.dot_general(
                                Wy, ls, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
                            acc[1] = jax.lax.dot_general(
                                t1l.astype(wdt), WxT,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)

              if not lit or center:
                if _abl("dot2"):          # skip the merged contraction
                    od = sum(p[:, :1] * 0.001 for p in y_parts) \
                        + sum(p[:1, :].T[:RP] * 0.0 for p in x_parts)
                else:
                    # ONE [RM, U*V] x [U*V, RM] MXU contraction per grid
                    # step: K is step-ordered, so the f32 accumulation order
                    # matches the sequential per-step dot2s (and XLA)
                    od = jax.lax.dot_general(
                        jnp.concatenate(y_parts, axis=1) if U > 1
                        else y_parts[0],
                        jnp.concatenate(x_parts, axis=0) if U > 1
                        else x_parts[0],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                acc[0] = acc[0] + od

            # ---- epilogue: select, fan-warp, write --------------------------
            def _write_one(i_, pre=None):
                (lo_x, lo_y, lo_z, ext, scale, szn, vld,
                 rx_row, ry_col) = pread(i_)
                k_ = n * PW + i_
                b_ = (jnp.int32(i_) if PAIR else b) if fused else None
                sx0 = gfs(i_, _G_SX0)
                sy0 = gfs(i_, _G_SY0)
                # T is NOT shifted: T = 1 - P2 exactly (the OVER weights
                # telescope: sum_s T_s alpha_s = 1 - T_final) and the shift
                # weights sum to 1, so T_warped = 1 - P2_warped -- one less
                # plane through the shift loop (unlit ships a single plane)
                # planes at MARCH resolution: lit (P1, P2); unlit the
                # LINEAR optical depth q = od * scale*dt — the whole fan +
                # upsample chain below stays linear and ONE exp runs at the
                # end (invalid rows have od = 0 -> P2 = 0 / T = 1)
                if pre is not None:
                    # packed pair fan already produced the exps and the
                    # clamp count (_fan_pair); continue at the placement
                    P1m, P2m = pre
                    n_clamp = jnp.int32(0)
                else:
                    if PAIR:
                        # extract this member's diagonal block from the paired
                        # accumulator planes (vreg value slices; the off-diag
                        # blocks are the packing's discarded cross terms)
                        sl = slice(i_ * RM, (i_ + 1) * RM)
                        a0 = acc[0][sl, sl]
                        a1 = acc[1][sl, sl] if NP > 1 else None
                    else:
                        a0 = acc[0]
                        a1 = acc[1] if NP > 1 else None
                    if lit and not center:
                        # reconstitute P2 = 1 - T once per particle (the
                        # per-step accumulators are (P1, T); the fan then
                        # shifts (P1, P2) exactly as before)
                        img4 = [a0, 1.0 - a1]
                    elif center:
                        # (q, tau') both LINEAR through the fan + upsample;
                        # atten = exp(-tau') once at the end
                        img4 = [a0 * geo[i_],
                                (scale * ext) * jnp.maximum(a1, 0.0)]
                    else:
                        img4 = [a0 * geo[i_]]

                    # the fan runs at MARCH resolution, in march-cell units:
                    # march column m sits at rect offset m*ratio pixels, the
                    # march spacing is ratio pixels, and the K-pixel clamp is
                    # Kc = K/ratio cells (Km = ceil(Kc) static shift taps) —
                    # (RM/RP)^2 fewer fan divides/fmas AND ~ratio fewer taps
                    ratio = (RP - 1.0) / max(RM - 1, 1)
                    Kc = K / ratio
                    Km = K if RM == RP else -int(-Kc // 1)
                    jj = jax.lax.broadcasted_iota(
                        jnp.int32, (RM, RM), 0).astype(jnp.float32)
                    ii = jax.lax.broadcasted_iota(
                        jnp.int32, (RM, RM), 1).astype(jnp.float32)
                    px_c = gfs(i_, _G_PXC)
                    py_c = gfs(i_, _G_PYC)
                    rxc, ryc, rzc = camf_r[0, 3], camf_r[0, 4], camf_r[0, 5]
                    uxc, uyc, uzc = camf_r[0, 6], camf_r[0, 7], camf_r[0, 8]
                    sxs, sys = camf_r[0, 12], camf_r[0, 13]
                    iv = ii[0:1, :] * ratio              # [1, RM] pixel offsets
                    jv = jj[:, 0:1] * ratio              # [RM, 1]
                    dox_step = 2.0 * sxs / W_ * ratio    # ox per march column
                    doy_step = -2.0 * sys / H_ * ratio

                    def safe_div(num, den):
                        sgn = jnp.where(den >= 0, 1.0, -1.0)
                        return num / (sgn * jnp.maximum(jnp.abs(den), 1e-12))

                    # closed-form fan shifts (render/warp.fan_shifts: the literal
                    # (rx_p - rx_u)/spacing form is a ~3000x fp32-ulp amplifier)
                    doy_j = (py_c - (sy0 + jv + 0.5)) * (2.0 * sys / H_)
                    dox_i = ((sx0 + iv + 0.5) - px_c) * (2.0 * sxs / W_)
                    if _abl("duchain"):   # skip the rational shift chains
                        du = doy_j * 1e-6 + 0.0 * ii
                    elif persp:
                        ox_i = ((sx0 + iv + 0.5) * (2.0 / W_) - 1.0) * sxs
                        oy_c = (1.0 - py_c * (2.0 / H_)) * sys
                        D_ic = fwd_z + ox_i * rzc + oy_c * uzc       # [1, RM]
                        Nx_ic = fwd_x + ox_i * rxc + oy_c * uxc
                        Fy_i = uxc * D_ic - Nx_ic * uzc
                        Gx_i = rxc * D_ic - Nx_ic * rzc
                        D_ip1 = D_ic + dox_step * rzc
                        D_ij = D_ic + doy_j * uzc                    # [RM, RM]
                        # per-COLUMN rational factor hoisted to 1-D (only D_ij
                        # genuinely varies in 2-D): one [1, RM] safe-div + one
                        # [RM, RM] safe-div instead of two full [RM, RM]
                        # multiply chains feeding one
                        A_i = safe_div(Fy_i * D_ip1, dox_step * Gx_i)  # [1, RM]
                        du = safe_div(doy_j * A_i, D_ij)
                    else:
                        Ax = rxc - rzc * kx
                        Bx = uxc - uzc * kx
                        du = safe_div(doy_j * Bx, dox_step * Ax) + 0.0 * ii
                    clamped = ((du < -Kc) | (du > Kc - 1e-3)) & (vld > 0)
                    du = jnp.clip(du, -Kc, Kc - 1e-3)
                    du = jnp.maximum(du, -ii)
                    du = jnp.minimum(du, (RM - 1.0 - 1e-3) - ii)
                    n_clamp = jnp.sum(clamped.astype(jnp.int32))

                    def shift_interp(planes, delta, axis):
                        # combined-weight form: out = sum_d w_d * img[.+d] with
                        # w_d = (d0==d)(1-fr) + (d0==d-1) fr — ONE slice + one
                        # fma per plane per shift, the weight shared across
                        # planes (the naive per-shift lerp costs ~3x more VPU)
                        d0 = jnp.floor(delta)
                        fr = delta - d0
                        pads = []
                        for img in planes:
                            zpad = jnp.zeros((RM, Km) if axis == 1 else (Km, RM),
                                             jnp.float32)
                            pads.append(jnp.concatenate([zpad, img, zpad],
                                                        axis=axis))
                        outs = [jnp.zeros((RM, RM), jnp.float32) for _ in planes]
                        m_prev = jnp.zeros((RM, RM), jnp.float32)
                        for dsh in range(-Km, Km + 1):
                            m = ((d0 == dsh).astype(jnp.float32)
                                 if dsh <= Km - 1 else jnp.float32(0.0))
                            w = m + fr * (m_prev - m)   # m*(1-fr) + m_prev*fr
                            idx = [slice(None)] * 2
                            idx[axis] = slice(Km + dsh, Km + dsh + RM)
                            for p in range(len(planes)):
                                outs[p] = outs[p] + w * pads[p][tuple(idx)]
                            m_prev = m
                        return outs

                    if not _abl("fan"):
                        # center mode: the attenuation plane (img4[1]) SKIPS the
                        # fan — atten is a smooth field and the ±K px correction
                        # is visually nil on it (PSNR-gated vs per-step light;
                        # oracle mirrors the bypass), halving the fan VPU cost
                        # of the lit presets
                        if center:
                            img4 = shift_interp(img4[:1], du, axis=1) \
                                + list(img4[1:])
                        else:
                            img4 = shift_interp(img4, du, axis=1)
                    if row_fan:
                        if _abl("duchain"):
                            dw = dox_i * 1e-6 + 0.0 * jj
                        elif persp:
                            oy_j = (1.0 - (sy0 + jv + 0.5) * (2.0 / H_)) * sys
                            ox_c = (px_c * (2.0 / W_) - 1.0) * sxs
                            D_cj = fwd_z + oy_j * uzc + ox_c * rzc   # [RM, 1]
                            Ny_cj = fwd_y + oy_j * uyc + ox_c * ryc
                            Fx_j = ryc * D_cj - Ny_cj * rzc
                            Gy_j = uyc * D_cj - Ny_cj * uzc
                            D_jp1 = D_cj + doy_step * uzc
                            D_ij2 = D_cj + dox_i * rzc
                            B_j = safe_div(Fx_j * D_jp1,
                                           doy_step * Gy_j)          # [RM, 1]
                            dw = safe_div(dox_i * B_j, D_ij2)
                        else:
                            Ay = ryc - rzc * ky
                            By = uyc - uzc * ky
                            dw = safe_div(dox_i * Ay, doy_step * By) + 0.0 * jj
                        clamped_y = ((dw < -Kc) | (dw > Kc - 1e-3)) & (vld > 0)
                        dw = jnp.clip(dw, -Kc, Kc - 1e-3)
                        dw = jnp.maximum(dw, -jj)
                        dw = jnp.minimum(dw, (RM - 1.0 - 1e-3) - jj)
                        n_clamp = n_clamp + jnp.sum(clamped_y.astype(jnp.int32))
                        if not _abl("fan"):
                            if center:
                                img4 = shift_interp(img4[:1], dw, axis=0) \
                                    + list(img4[1:])
                            else:
                                img4 = shift_interp(img4, dw, axis=0)

                    # The unlit/center exps run AT MARCH RESOLUTION, before the
                    # upsample: the upsampled quantity is the saturated opacity
                    # P2 (and P1), not the linear optical depth — the classic
                    # reduced-resolution-impostor choice, mirrored by the
                    # oracle.  This keeps the exp on [RM, RM] instead of the
                    # (much larger) rect/window planes.  Lit per-step planes
                    # are already (P1, P2) and are unaffected.
                    if lit and not center:
                        P1m, P2m = img4
                    elif center:
                        qm, tpm = img4
                        if _abl("exps"):
                            P2m, P1m = qm, tpm + qm
                        else:
                            P2m = 1.0 - jnp.exp(-qm)
                            P1m = jnp.exp(-tpm) * P2m   # per-ray mid-depth
                            #                             atten
                    else:
                        qm, = img4
                        P2m = (qm if _abl("exps")
                               else 1.0 - jnp.exp(-qm))
                        P1m = P2m    # atten == 1: P1 degenerates to P2
                # unlit places/upsamples ONE plane (P1 is an alias of P2)
                one_plane = not lit

                # hat-upsample march grid -> rect (identity when RM == RP).
                # FUSED: the (dy, dx) sub-tile canvas placement FOLDS INTO
                # the upsample weights — everything from here on is linear
                # in the planes, so upsampling straight into window
                # coordinates replaces the old pad-buffer + 8 pltpu.rolls
                # per particle (the single largest composite VPU cost).
                # Window rows/cols outside the rect get hat position -2 =>
                # all-zero weight row => exactly the OVER identity
                # (P = 0, T = 1) the pad ring used to provide.  Weight
                # VALUES and the contraction order are bit-identical to
                # upsample_weights + roll placement; with RM == RP the
                # weights are an exact {0, 1} permutation and the matmuls
                # run f32/HIGHEST, so no new rounding point exists vs the
                # rolls.
                if fused:
                    ratio_m = float(np.float32(RM - 1)
                                    / np.float32(max(RP - 1, 1)))
                    exact = RM == RP and not CELLS
                    pdt = jnp.float32 if exact else wdt
                    pprec = jax.lax.Precision.HIGHEST if exact else prec
                    # placement position: dyf/dxu = the particle's
                    # (fractional in coarse mode) placement origin minus the
                    # window corner, in canvas y/x units (_G_AYF/_G_AXF are
                    # host-computed, the corners are the prefetched refs)
                    dyf = gfs(i_, _G_AYF) - oy_ref[k_].astype(jnp.float32)
                    dxu = gfs(i_, _G_AXF) \
                        - ox_ref[k_].astype(jnp.float32) * (1.0 / cg.e)
                    iww = jax.lax.broadcasted_iota(
                        jnp.int32, (WH, 1), 0).astype(jnp.float32)
                    posy = iww - dyf            # rect row / cell offset
                    if CELLS:
                        # canvas cells: map cell offsets to march cells by
                        # the static C2M factor (1.0 exactly in coarse mode
                        # — canvas cells ARE march cells there); the
                        # fractional hat tent IS the support (no
                        # outside-rect mask — hat() is zero past it)
                        gyp = posy * C2M
                    else:
                        gyp = jnp.where((posy >= 0) & (posy <= RP - 1),
                                        posy * ratio_m, -2.0)    # [WH, 1]
                    m_i = jax.lax.broadcasted_iota(
                        jnp.int32, (WH, RM), 1).astype(jnp.float32)
                    Uyp = jnp.maximum(0.0, 1.0 - jnp.abs(gyp - m_i)) \
                        .astype(pdt)                             # [WH, RM]
                    planes_m = [P2m] if one_plane else [P1m, P2m]
                    if not _abl("up"):
                        # the y-side contraction is shared by both window
                        # halves
                        t_list = [jax.lax.dot_general(
                            Uyp, p.astype(pdt), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=pprec).astype(pdt)
                            for p in planes_m]                   # [WH, RM]

                    def _hat_x(off, wwn):
                        """x placement hat matrix [RM, wwn] (+ the lane
                        channel phase [1, wwn] in ILV mode)."""
                        jwn = jax.lax.broadcasted_iota(
                            jnp.int32, (1, wwn), 1) + off
                        if ILV:
                            # lane l covers canvas cell (ox + l) // 4 and
                            # channel (ox + l) % 4; ox is 128-aligned so
                            # the phase is l % 4
                            ph = jwn - (jwn // 4) * 4
                            posx = (jwn - ph).astype(jnp.float32) * 0.25 \
                                - dxu
                        else:
                            ph = None
                            posx = jwn.astype(jnp.float32) - dxu
                        if CELLS:
                            gxp = posx * C2M
                        else:
                            gxp = jnp.where((posx >= 0) & (posx <= RP - 1),
                                            posx * ratio_m, -2.0)
                        k_i = jax.lax.broadcasted_iota(
                            jnp.int32, (RM, wwn), 0).astype(jnp.float32)
                        return jnp.maximum(0.0, 1.0 - jnp.abs(k_i - gxp)), ph

                    def xplace(off, wwn):
                        """Placed window-column update for [off, off+wwn):
                        a list of placed (P1, P2) planes — or, in ILV mode,
                        the single channel-expanded update matrix U with
                        win += TW4 * U (TW4 = the window's own T lanes
                        spread to all 4 channel phases)."""
                        if _abl("up"):    # skip the placement matmuls
                            # (scalar splat keeps the data dependency; 2-D
                            # broadcasts of [1,1] slices don't lower)
                            zs = [jnp.zeros((WH, wwn), jnp.float32)
                                  + jnp.sum(p) * 1e-9 for p in planes_m]
                            return zs[0] if ILV else zs
                        if not ILV:
                            Uxp, _ = _hat_x(off, wwn)
                            Uxp = Uxp.astype(pdt)                # [RM, wwn]
                            return [jax.lax.dot_general(
                                t, Uxp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=pprec) for t in t_list]
                        # ILV: fold the per-channel scalar coefficients into
                        # the x weights (W[k, 4x+c] = hat * A[c]) so ONE
                        # matmul produces the interleaved update for all 4
                        # channels: U[w, l] = sum_k t_cat[w, k] * W[k, l]
                        #                   = c1[l%4]*P1p + c2[l%4]*P2p
                        H, ph = _hat_x(off, wwn)                 # [RM, wwn]
                        phf = ph.astype(jnp.float32)
                        alb = [gfs(i_, _G_ALB_R + ch) for ch in range(3)]

                        def lanevec(c0, c1, c2, c3):
                            return jnp.where(
                                phf == 0.0, c0, jnp.where(
                                    phf == 1.0, c1, jnp.where(
                                        phf == 2.0, c2, c3)))    # [1, wwn]
                        if one_plane:
                            # unlit: upd = alb*(lcol+amb) * T2; T -= T2
                            A = lanevec(
                                alb[0] * (lightf_r[0, 0] + lightf_r[0, 3]),
                                alb[1] * (lightf_r[0, 1] + lightf_r[0, 4]),
                                alb[2] * (lightf_r[0, 2] + lightf_r[0, 5]),
                                -1.0)
                            W = (H * A).astype(pdt)
                            tc = t_list[0]
                        else:
                            A1 = lanevec(alb[0] * lightf_r[0, 0],
                                         alb[1] * lightf_r[0, 1],
                                         alb[2] * lightf_r[0, 2], 0.0)
                            A2 = lanevec(alb[0] * lightf_r[0, 3],
                                         alb[1] * lightf_r[0, 4],
                                         alb[2] * lightf_r[0, 5], -1.0)
                            W = jnp.concatenate(
                                [(H * A1).astype(pdt), (H * A2).astype(pdt)],
                                axis=0)                          # [2RM, wwn]
                            tc = jnp.concatenate(t_list, axis=1)  # [WH, 2RM]
                        return jax.lax.dot_general(
                            tc, W, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=pprec)                     # [WH, wwn]

                if fused:
                    pass   # placement + RMW happen per window half below
                elif RM != RP:
                    def up(pln):      # [RM, RM] -> [RP, RP], f32 accum
                        if _abl("up"):    # skip the upsample matmuls
                            # (scalar splat keeps the data dependency; 2-D
                            # broadcasts of [1,1] slices don't lower)
                            return jnp.zeros((RP, RP), jnp.float32) \
                                + jnp.sum(pln) * 1e-9
                        t_ = jax.lax.dot_general(
                            uy_r[...], pln.astype(wdt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
                        return jax.lax.dot_general(
                            t_.astype(wdt), ux_r[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
                    ups = ([up(P2m)] if one_plane else [up(P1m), up(P2m)])
                    P1, P2 = (ups[0], ups[0]) if one_plane else ups
                else:
                    P1, P2 = P1m, P2m

                # RGB expansion: C_ch = alb*(lcol*P1 + amb*P2) — at rect
                # resolution unfused, at WINDOW resolution fused (outside
                # the rect P1 = P2 = 0, exactly the OVER identity)
                if not fused:
                    Tpl = 1.0 - P2
                    for ch in range(3):
                        alb = gfs(0, _G_ALB_R + ch)
                        img_out[0, ch] = (alb * (lightf_r[0, ch] * P1
                                                 + lightf_r[0, 3 + ch] * P2)
                                          ).astype(img_out.dtype)
                    img_out[0, 3] = Tpl.astype(img_out.dtype)

                clamp_out[0, 0] = clamp_out[0, 0] + n_clamp

                if fused:
                    # ---- fused composite: RMW this particle's canvas
                    # window in place, per window half.  The placed planes
                    # feed the RGB expansion straight into the RMW — no
                    # pad buffer, no rolls.
                    def rmw(col0, wwn, placed):
                        """RMW window columns [col0, col0+wwn) of win[b_]."""
                        if _abl("comp"):   # keep DMAs, skip the RMW
                            return
                        if ILV:
                            # placed == U (channel-expanded update):
                            # win += TW4 * U, where TW4 spreads the window's
                            # own T lanes (phase 3) to all 4 channel phases
                            # by three static lane rolls — the adds only
                            # ever combine one non-zero term per lane, and
                            # the circular wrap lands on non-matching
                            # phases (wwn % 4 == 0), so TW4 is exact.
                            w = win[b_, :, col0:col0 + wwn] \
                                .astype(jnp.float32)
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, (WH, wwn), 1)
                            m3 = jnp.where(lane - (lane // 4) * 4 == 3,
                                           w, 0.0)
                            tw4 = m3
                            for rr_ in (1, 2, 3):
                                tw4 = tw4 + pltpu.roll(m3, wwn - rr_, 1)
                            win[b_, :, col0:col0 + wwn] = \
                                (w + tw4 * placed).astype(cdt)
                            return
                        P1h, P2h = ((placed[0], placed[0]) if one_plane
                                    else placed)
                        Tw = win[b_, 3, :, col0:col0 + wwn] \
                            .astype(jnp.float32)
                        # scalar-weight hoist: the window-sized products
                        # T2 = Tw*P2 (and T1 = Tw*P1) are shared across
                        # channels, each channel fma then uses SCALAR
                        # coefficients only (unlit folds to ONE fma:
                        # alb*(lcol+amb) is a scalar), and the T update is
                        # Tw - T2 == Tw*(1 - P2) reassociated
                        T2 = Tw * P2h
                        T1 = T2 if one_plane else Tw * P1h
                        for ch in range(3):
                            alb = gfs(i_, _G_ALB_R + ch)
                            if one_plane:
                                cc = alb * (lightf_r[0, ch]
                                            + lightf_r[0, 3 + ch])
                                upd = cc * T2
                            else:
                                upd = (alb * lightf_r[0, ch]) * T1 \
                                    + (alb * lightf_r[0, 3 + ch]) * T2
                            win[b_, ch, :, col0:col0 + wwn] = (
                                win[b_, ch, :, col0:col0 + wwn]
                                .astype(jnp.float32) + upd).astype(cdt)
                        win[b_, 3, :, col0:col0 + wwn] = (Tw - T2).astype(cdt)

                    if PAIR and i_ == 1:
                        # deferred q fetch: q's window overlaps p's, so its
                        # fetch had to wait for p's write-back (started just
                        # above in the i_ == 0 iteration); the protocol's
                        # overlap wait now sees that copy
                        @pl.when(ov_ref[k_] == 1)
                        def _deferred_fetch():
                            fetch_seq(k_, b_)

                    if not _abl("windma"):
                        cinA_desc(k_, b_).wait()
                    rmw(0, WWA, xplace(0, WWA))
                    if not _abl("windma"):
                        coutA_desc(k_, b_).start()

                    if WWB:
                        # rare wide particles touch columns >= WWA: fetch,
                        # RMW and write back the B half SYNCHRONOUSLY
                        @pl.when(wide_ref[k_] == 1)
                        def _b_half():
                            if _abl("windma"):   # keep the compute,
                                rmw(WWA, WWB, xplace(WWA, WWB))  # skip DMAs
                                return
                            cinB_desc(k_, b_).start()
                            placed_b = xplace(WWA, WWB)
                            cinB_desc(k_, b_).wait()
                            rmw(WWA, WWB, placed_b)
                            cb = coutB_desc(k_, b_)
                            cb.start()
                            cb.wait()


            def _fan_pair():
                """Packed pair fan: both members' march planes sit side by
                side on the LANE axis ([RM, MR]), so every 2-D op in the du
                chain, the shift taps, and the exps runs at full lane width
                (the per-member [RM, RM] shapes only fill half a vreg).
                The shift clamps use LOCAL column indices, which pins every
                nonzero shift tap inside its own lane block — cross-block
                reads only ever multiply an exact 0.0 weight — so each
                block is bit-identical to the unpaired fan.  Returns
                ([(P1m, P2m)] per member, shift-clamp count)."""
                ratio = (RP - 1.0) / max(RM - 1, 1)
                Kc = K / ratio
                Km = K if RM == RP else -int(-Kc // 1)
                jv = jax.lax.broadcasted_iota(
                    jnp.int32, (RM, 1), 0).astype(jnp.float32) * ratio
                i1 = jax.lax.broadcasted_iota(
                    jnp.int32, (1, RM), 1).astype(jnp.float32)
                iv = i1 * ratio                      # [1, RM] pixel offsets
                iil = jnp.concatenate([i1] * PW, axis=1)   # LOCAL col index
                rxc, ryc, rzc = camf_r[0, 3], camf_r[0, 4], camf_r[0, 5]
                uxc, uyc, uzc = camf_r[0, 6], camf_r[0, 7], camf_r[0, 8]
                sxs, sys = camf_r[0, 12], camf_r[0, 13]
                dox_step = 2.0 * sxs / W_ * ratio
                doy_step = -2.0 * sys / H_ * ratio

                def safe_div(num, den):
                    sgn = jnp.where(den >= 0, 1.0, -1.0)
                    return num / (sgn * jnp.maximum(jnp.abs(den), 1e-12))

                def bcat(cols):                      # [1, RM] x PW -> [1, MR]
                    return jnp.concatenate(cols, axis=1)

                def rcat(rows):                      # [RM, 1] x PW -> [RM, MR]
                    return jnp.concatenate(
                        [jnp.broadcast_to(r, (RM, RM)) for r in rows], axis=1)

                doyj_i, D_ic_i, A_i_i, vm_i = [], [], [], []
                doxi_i, Bj_i, Dcj_i = [], [], []
                for i_ in range(PW):
                    px_c = gfs(i_, _G_PXC)
                    py_c = gfs(i_, _G_PYC)
                    sx0 = gfs(i_, _G_SX0)
                    sy0 = gfs(i_, _G_SY0)
                    vldi = gfs(i_, _G_VALID)
                    doy_j = (py_c - (sy0 + jv + 0.5)) * (2.0 * sys / H_)
                    doyj_i.append(doy_j)
                    # f32 on the lane concat: Mosaic cannot relayout i1
                    # vectors across the packed-lane cat in every canvas
                    # layout (bitcast_vreg i1->i32 fails under coarse/ilv);
                    # compare back to bool after bcat
                    vm_i.append(jnp.broadcast_to(
                        (vldi > 0).astype(jnp.float32), (1, RM)))
                    if persp:
                        ox_i = ((sx0 + iv + 0.5) * (2.0 / W_) - 1.0) * sxs
                        oy_c = (1.0 - py_c * (2.0 / H_)) * sys
                        D_ic = fwd_z + ox_i * rzc + oy_c * uzc   # [1, RM]
                        Nx_ic = fwd_x + ox_i * rxc + oy_c * uxc
                        Fy_i = uxc * D_ic - Nx_ic * uzc
                        Gx_i = rxc * D_ic - Nx_ic * rzc
                        D_ip1 = D_ic + dox_step * rzc
                        D_ic_i.append(D_ic)
                        A_i_i.append(safe_div(Fy_i * D_ip1,
                                              dox_step * Gx_i))
                    if row_fan:
                        dox_i = ((sx0 + iv + 0.5) - px_c) * (2.0 * sxs / W_)
                        doxi_i.append(dox_i)
                        if persp:
                            oy_j = (1.0 - (sy0 + jv + 0.5) * (2.0 / H_)) \
                                * sys
                            ox_c = (px_c * (2.0 / W_) - 1.0) * sxs
                            D_cj = fwd_z + oy_j * uzc + ox_c * rzc  # [RM, 1]
                            Ny_cj = fwd_y + oy_j * uyc + ox_c * ryc
                            Fx_j = ryc * D_cj - Ny_cj * rzc
                            Gy_j = uyc * D_cj - Ny_cj * uzc
                            D_jp1 = D_cj + doy_step * uzc
                            Dcj_i.append(D_cj)
                            Bj_i.append(safe_div(Fx_j * D_jp1,
                                                 doy_step * Gy_j))

                doyj_p = rcat(doyj_i)                # [RM, MR]
                vmask = bcat(vm_i) > 0.5
                if _abl("duchain"):   # skip the 2-D rational shift chains
                    du = doyj_p * 1e-6
                elif persp:
                    D_ij = bcat(D_ic_i) + doyj_p * uzc
                    du = safe_div(doyj_p * bcat(A_i_i), D_ij)
                else:
                    Ax = rxc - rzc * kx
                    Bx = uxc - uzc * kx
                    du = safe_div(doyj_p * Bx, dox_step * Ax)
                clamped = ((du < -Kc) | (du > Kc - 1e-3)) & vmask
                du = jnp.clip(du, -Kc, Kc - 1e-3)
                du = jnp.maximum(du, -iil)
                du = jnp.minimum(du, (RM - 1.0 - 1e-3) - iil)
                n_clamp = jnp.sum(clamped.astype(jnp.int32))

                def shift_packed(imgs, delta, axis):
                    # combined-weight static-shift loop over a LIST of
                    # planes: the per-tap weight is shared (exactly as the
                    # unpaired shift_interp) so extra planes cost one fma
                    # each per tap
                    d0 = jnp.floor(delta)
                    fr = delta - d0
                    zpad = jnp.zeros((RM, Km) if axis == 1 else (Km, MR),
                                     jnp.float32)
                    pads = [jnp.concatenate([zpad, img, zpad], axis=axis)
                            for img in imgs]
                    outs = [jnp.zeros((RM, MR), jnp.float32) for _ in imgs]
                    m_prev = jnp.zeros((RM, MR), jnp.float32)
                    ln = MR if axis == 1 else RM
                    for dsh in range(-Km, Km + 1):
                        m = ((d0 == dsh).astype(jnp.float32)
                             if dsh <= Km - 1 else jnp.float32(0.0))
                        w = m + fr * (m_prev - m)
                        idx = [slice(None)] * 2
                        idx[axis] = slice(Km + dsh, Km + dsh + ln)
                        for p in range(len(imgs)):
                            outs[p] = outs[p] + w * pads[p][tuple(idx)]
                        m_prev = m
                    return outs

                # packed planes: diagonal blocks side by side on lanes
                def dcat(a):
                    return jnp.concatenate(
                        [a[i_ * RM:(i_ + 1) * RM, i_ * RM:(i_ + 1) * RM]
                         for i_ in range(PW)], axis=1)
                if lit and not center:
                    # per-step lit: the accumulators are already (P1, T);
                    # reconstitute P2 = 1 - T once and shift BOTH planes
                    # (exactly the unpaired epilogue's img4 = [a0, 1 - a1])
                    planes = [dcat(acc[0]), 1.0 - dcat(acc[1])]
                else:
                    geo_p = jnp.concatenate([geo[i_] for i_ in range(PW)],
                                            axis=1)
                    planes = [dcat(acc[0]) * geo_p]
                if center:
                    se_p = bcat([jnp.broadcast_to(
                        gfs(i_, _G_SCALE) * gfs(i_, _G_EXT), (1, RM))
                        for i_ in range(PW)])
                    t_p = se_p * jnp.maximum(dcat(acc[1]), 0.0)

                if not _abl("fan"):
                    planes = shift_packed(planes, du, 1)
                if row_fan:
                    jjc = jax.lax.broadcasted_iota(
                        jnp.int32, (RM, 1), 0).astype(jnp.float32)
                    if _abl("duchain"):
                        dw = bcat(doxi_i) * 1e-6 + 0.0 * doyj_p
                    elif persp:
                        D_ij2 = jnp.concatenate(
                            [Dcj_i[i_] + doxi_i[i_] * rzc
                             for i_ in range(PW)], axis=1)
                        dw = safe_div(jnp.concatenate(
                            [doxi_i[i_] * Bj_i[i_] for i_ in range(PW)],
                            axis=1), D_ij2)
                    else:
                        Ay = ryc - rzc * ky
                        By = uyc - uzc * ky
                        dw = safe_div(
                            bcat(doxi_i) * Ay, doy_step * By) + 0.0 * doyj_p
                    clamped_y = ((dw < -Kc) | (dw > Kc - 1e-3)) & vmask
                    dw = jnp.clip(dw, -Kc, Kc - 1e-3)
                    dw = jnp.maximum(dw, -jjc)
                    dw = jnp.minimum(dw, (RM - 1.0 - 1e-3) - jjc)
                    n_clamp = n_clamp + jnp.sum(clamped_y.astype(jnp.int32))
                    if not _abl("fan"):
                        planes = shift_packed(planes, dw, 0)

                if lit and not center:
                    # per-step lit planes are already (P1, P2): no exps
                    P1m_p, P2m_p = planes
                # exps at march resolution, packed
                elif _abl("exps"):
                    P2m_p = planes[0]
                    P1m_p = t_p + planes[0] if center else planes[0]
                else:
                    P2m_p = 1.0 - jnp.exp(-planes[0])
                    P1m_p = jnp.exp(-t_p) * P2m_p if center else P2m_p
                pres = [(P1m_p[:, i_ * RM:(i_ + 1) * RM],
                         P2m_p[:, i_ * RM:(i_ + 1) * RM])
                        for i_ in range(PW)]
                return pres, n_clamp

            @pl.when(s == SG - 1)
            def _write():
                @pl.when(n == 0)
                def _zero():
                    clamp_out[0, 0] = 0
                if _abl("writeoff"):   # skip the WHOLE epilogue: with
                    return             # march+init+windma+writeoff the body
                #                        is grid machinery + predicates only
                if PAIR:
                    pres, nc_pair = _fan_pair()
                    clamp_out[0, 0] = clamp_out[0, 0] + nc_pair
                    for i_ in range(PW):
                        _write_one(i_, pres[i_])
                else:
                    for i_ in range(PW):
                        _write_one(i_)
                if fused and not _abl("windma"):
                    if PAIR:
                        @pl.when(n == N2 - 1)
                        def _drain_q():
                            coutA_desc(n * PW + 1, jnp.int32(1)).wait()

                        @pl.when((n == N2 - 1)
                                 & (ov_ref[n * PW + 1] == 0))
                        def _drain_p():
                            # (when q overlapped p, its deferred fetch
                            # already consumed p's write-back semaphore)
                            coutA_desc(n * PW, jnp.int32(0)).wait()
                    else:
                        @pl.when(n == N - 1)
                        def _drain_own():
                            coutA_desc(n, b).wait()
                        if N > 1:
                            @pl.when((n == N - 1) & (ov_ref[n] == 0))
                            def _drain_prev():
                                coutA_desc(n, 1 - b).wait()
                if fused and RES:
                    # the drains above ordered every window write-back into
                    # cvs before this single HBM flush
                    @pl.when(n == N2 - 1)
                    def _flush():
                        cp = pltpu.make_async_copy(cvs, canvas_out, sem_flush)
                        cp.start()
                        cp.wait()

        for _jq in range(QP):
            _pair_iter(ng * QP + _jq if QP > 1 else ng, _jq * PW)


    def vol_spec(u, off):
        # invalid rows (dead/culled or the other size class) map to a
        # CONSTANT block: Pallas re-fetches only when the index changes,
        # so contiguous invalid rows stream no slab DMAs at all (the
        # depth-sorted chunks keep classes nearly contiguous)
        def imap(n, s, v, f, vl, *pf, u=u, off=off):
            z0 = jnp.where(vl[n] == 0, 0,
                           z0_of(s_eff(s * U + u, f[n])) + off)
            return (jnp.where(vl[n] == 0, 0, v[n]), z0, 0, 0)
        return pl.BlockSpec((1, 1, V, V), imap, memory_space=pltpu.VMEM)

    def vol_full_spec():
        def imap(n, s, v, f, vl, *pf):
            return (jnp.where(vl[n] == 0, 0, v[n]), 0, 0, 0)
        return pl.BlockSpec((1, V, V, V), imap, memory_space=pltpu.VMEM)

    def stack_spec(i=0):
        # invalid rows map to block 0 (same DMA-dedup trick as vol_spec);
        # paired mode streams one stack per pair member, packed mode one
        # per (pair, member) of the entry (i in [0, QP*PW))
        def imap(n, s, v, f, vl, *pf, i=i):
            k = n * (QP * PW) + i
            return (jnp.where(vl[k] == 0, 0, v[k]), 0, 0, 0)
        if _cspec("stack"):
            return pl.BlockSpec((1, S, VX, V),
                                lambda n, s, *pf: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, S, VX, V), imap, memory_space=pltpu.VMEM)

    def stack_res_spec():
        # constant block index: the whole [M*S, VX, V] bank is fetched
        # exactly once and stays VMEM-resident across the grid
        return pl.BlockSpec((Ms * S, VX, V),
                            lambda n, s, *pf: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    if use_stack:
        vol_specs = ([stack_res_spec()]
                     if (stack_resident or dens_resident)
                     else [stack_spec(i) for i in range(QP * PW)])
    elif full_vol:
        vol_specs = [vol_full_spec()]
    else:
        vol_specs = [vol_spec(u, off) for u in range(U) for off in (0, 1)]
    _pn = (lambda n, s, *pf: (0, 0, 0)) if _cspec("pern") \
        else (lambda n, s, *pf: (n, 0, 0))
    per_n_smem = pl.BlockSpec((QP * PW, 1, _GF), _pn,
                              memory_space=pltpu.SMEM)
    const_smem = pl.BlockSpec((1, 16), lambda n, s, *pf: (0, 0),
                              memory_space=pltpu.SMEM)
    def stack_input(bank):
        return (bank.reshape(Ms * S, VX, V)
                if (stack_resident or dens_resident) else bank)

    in_specs = list(vol_specs)
    inputs = [stack_input(slab_banks[0]) if use_stack
              else volumes] * len(vol_specs)
    if lit:
        if center and use_stack and not stack_resident:
            # center mode reads ONE light slab per particle: stream a
            # [1, 1, V, V] mid-slab block instead of the full stack
            def stack_mid_spec(i=0):
                def imap(n, s, v, f, vl, *pf, i=i):
                    k = n * (QP * PW) + i
                    return (jnp.where(vl[k] == 0, 0, v[k]), MID, 0, 0)
                if _cspec("mid"):
                    return pl.BlockSpec((1, 1, VX, V),
                                        lambda n, s, *pf: (0, MID, 0, 0),
                                        memory_space=pltpu.VMEM)
                return pl.BlockSpec((1, 1, VX, V), imap,
                                    memory_space=pltpu.VMEM)
            in_specs += [stack_mid_spec(i) for i in range(QP * PW)]
            inputs += [slab_banks[1]] * (QP * PW)
        else:
            in_specs += vol_specs
            inputs += [stack_input(slab_banks[1]) if use_stack
                       else light_volumes] * len(vol_specs)
    in_specs += [
        per_n_smem,
        pl.BlockSpec((QP * PW, 1, RM), _pn, memory_space=pltpu.VMEM),
        pl.BlockSpec((QP * PW, RM, 1), _pn, memory_space=pltpu.VMEM),
        const_smem,
        const_smem,
    ]
    inputs += [geomf[:, None], rxu2[:, None], ryw2, camf, lightf]
    if RM != RP and not fused:
        # constant hat-upsample weights (march grid -> rect), fetched
        # once (constant index maps) and kept VMEM-resident
        Uy_np, Ux_np = upsample_weights(RP, RM)
        in_specs += [
            pl.BlockSpec((RP, RM), lambda n, s, *pf: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RM, RP), lambda n, s, *pf: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [jnp.asarray(Uy_np).astype(wdt),
                   jnp.asarray(Ux_np).astype(wdt)]

    # unlit marches ASCENDING for every particle: the telescoped sum is
    # order-independent, and a constant order keeps the f32 accumulation
    # order identical to the XLA path.  Lit keeps the per-particle flip
    # so one front-to-back accumulator suffices.
    flip = ((geom["szn"] < 0).astype(jnp.int32) if (lit and not center)
            else jnp.zeros((N,), jnp.int32))
    vld_i = geom["valid"].astype(jnp.int32)
    scratch = [
        pltpu.VMEM((NP, MR, MR), jnp.float32),  # acc: (P1,P2,T) | (od,)
        pltpu.VMEM((PW, RM, RM), jnp.float32),  # geo: scale*dt
    ]

    if fused:
        Hc, Wc = cg.Hc, cg.Wc
        win_shape = (2, WH, WW) if ILV else (2, 4, WH, WW)
        cshape = (Hc, Wc) if ILV else (4, Hc, Wc)
        assert canvas.shape == cshape, (canvas.shape, cshape)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(N2 // QP, SG),
            in_specs=in_specs + ([] if RES else
                                 [pl.BlockSpec(memory_space=pl.ANY)]),
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1), lambda n, s, *pf: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=scratch + [
                pltpu.VMEM(win_shape, canvas.dtype),         # win x2
                pltpu.SemaphoreType.DMA((2,)),               # A in
                pltpu.SemaphoreType.DMA((2,)),               # A out
                pltpu.SemaphoreType.DMA(()),                 # B in
                pltpu.SemaphoreType.DMA(()),                 # B out
            ] + ([
                pltpu.VMEM(cshape, canvas.dtype),            # cvs (RES)
                pltpu.SemaphoreType.DMA(()),                 # flush
            ] if RES else []),
        )
        # canvas position: 9 prefetch + tensor inputs, canvas last
        # (RES: no canvas input — the VMEM scratch initializes in-kernel
        # and the output is written by the final flush DMA alone)
        alias_idx = 9 + len(inputs)
        canvas_out, clamp = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(cshape, canvas.dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)],
            input_output_aliases={} if RES else {alias_idx: 0},
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(vidx, flip, vld_i, comp["oy"], comp["ox"], comp["dy"],
          comp["dx"], comp["ov"], comp["wide"], *inputs,
          *([] if RES else [canvas]))
        return canvas_out, clamp[0, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, SG),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 4, RP, RP),
                         lambda n, s, *pf: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n, s, *pf: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=scratch,
    )

    images, clamp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, 4, RP, RP), wdt),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        interpret=_interpret(),
    )(vidx, flip, vld_i, *inputs)
    return images, clamp[0, 0]


def win_split(RP: int, WW: int) -> int:
    """The fused window's always-copied A-half width: the smallest
    128-multiple that covers the rect for a MAJORITY of sub-tile
    offsets (dx + RP <= WWA for dx up to WWA - RP >= 64, i.e. at least
    half the dx range); the remaining WW - WWA columns are the rare
    synchronous B half.  Must match _fused_comp_offsets's wide flag."""
    return min(WW, -(-(RP + 64) // 128) * 128)


class CanvasGeom(tuple):
    """Canvas + fused-window geometry in CANVAS-ARRAY units, shared by
    the kernel, the host-side offset computation, the oracle and the
    canvas finish.  Two orthogonal layout options (scene/config.py):

    * ``coarse`` (warp_coarse): the canvas x/y axes are MARCH CELLS of
      ``1/ratio`` pixels ((RP-1)/(RM-1) px, the march grid's spacing)
      instead of pixels.  A particle's march plane lands at the
      FRACTIONAL cell position a = pad + s*ratio (s = its rect origin
      in px), placed by 2-tap hat weights — the same matmul placement
      as the full-res path with ratio_m = 1 — and one bilinear
      cell->pixel upsample runs per frame in _canvas_finish.
    * ``ilv`` (warp_interleave): the x axis is CHANNEL-INTERLEAVED —
      the canvas is 2-D [Hc, Wc] with lane 4*x + c — so the 128-lane
      window alignment slop is paid once, not once per channel plane.

    Fields (array units: lanes on x when ilv, else cells/px):
      WH, WW     window rows / x-extent;  WWA  always-copied A half
      Hc, Wc     canvas array dims ([4, Hc, Wc] planes or [Hc, Wc] ilv)
      pad        content origin offset (cells if coarse else px)
      hc_img, wc_img   image extent in cells/px (pre-pad)
      cu         placement content extent: RM (coarse) or RP
      sup        placement support in x-units: cu + 1 when coarse
                 (fractional hat tent), else cu
      e          array elems per x-unit: 4 if ilv else 1
      gx         window x-offset granularity in x-units (128 // e)
      ratio      march cells per pixel as float (f32-exact), 1.0 unless
                 coarse
    """
    __slots__ = ()
    _fields = ("WH", "WW", "WWA", "Hc", "Wc", "pad", "hc_img", "wc_img",
               "cu", "sup", "e", "gx", "ratio", "coarse", "ilv")

    def __new__(cls, *a):
        return tuple.__new__(cls, a)

    def __getattr__(self, name):
        try:
            return self[self._fields.index(name)]
        except ValueError:
            raise AttributeError(name)


def canvas_geom(cfg: SceneConfig, h_local) -> CanvasGeom:
    """Geometry of the FUSED path's canvas (see CanvasGeom)."""
    r = cfg.render
    from volq.render.warp import march_rect
    RP = r.warp_rect
    RM = march_rect(cfg)
    coarse = bool(r.warp_coarse)
    ilv = bool(r.warp_interleave)
    if coarse:
        ratio = float(np.float32(RM - 1) / np.float32(RP - 1))
        cu, sup = RM, RM + 1
        hc_img = int(np.ceil((h_local - 1) * ratio)) + 1
        wc_img = int(np.ceil((r.width - 1) * ratio)) + 1
        pad = RM                  # covers off-screen rect origins:
        #                           |s0|*ratio <= (RP-1)*ratio = RM-1
    elif r.warp_canvas_scale:
        # sigma-canvas (warp_canvas_scale): cells of 1/ratio px at an
        # ARBITRARY scale between the march grid and pixels — the same
        # fractional-hat placement as coarse, with the hat positions
        # mapped march->canvas by the static cell2march factor in the
        # kernel.  cu = the placed content's cell extent; the hat tent
        # leaks a fraction past each end (sup = cu + 1), like coarse.
        ratio = float(np.float32(r.warp_canvas_scale))
        cu = int(np.ceil((RP - 1) * ratio)) + 1
        sup = cu + 1
        hc_img = int(np.ceil((h_local - 1) * ratio)) + 1
        wc_img = int(np.ceil((r.width - 1) * ratio)) + 1
        pad = cu                  # |s0|*ratio <= (RP-1)*ratio <= cu-1
    else:
        ratio = 1.0
        cu = sup = RP
        hc_img, wc_img = h_local, r.width
        pad = RP
    e = 4 if ilv else 1
    gx = 128 // e
    WH = -(-(sup + 8) // 8) * 8
    WW = -(-(e * (gx + sup)) // 128) * 128
    # A half: smallest 128-multiple covering at least ~half the offset
    # range; degenerate (= WW) when that already needs the whole window
    WWA = min(WW, -(-(e * (sup + gx // 2)) // 128) * 128)
    Hc = hc_img + pad + WH
    Wc = e * (wc_img + pad) + WW
    return CanvasGeom(WH, WW, WWA, Hc, Wc, pad, hc_img, wc_img, cu, sup,
                      e, gx, ratio, coarse, ilv)


def _canvas_dims(cfg: SceneConfig, h_local, fused: bool = False):
    """Legacy pixel-plane canvas dims ([4, Hc, Wc], no coarse/ilv) used
    by the UNFUSED composite path; the fused path uses canvas_geom.
    For default-layout configs the two agree exactly."""
    r = cfg.render
    RP = r.warp_rect
    WH = RP + 8                                  # widened window height
    # window width: RP + up to 127 sub-tile offset, rounded up to the
    # 128-lane grid.  (The fused kernel's matmul placement needs no roll
    # headroom, but Mosaic requires 128-aligned LANE SLICE SHAPES — a
    # 288-wide window slice fails "must be aligned to tiling (128)" —
    # so the round-up binds either way; ``fused`` kept for future use.)
    WW = -(-(RP + 128) // 128) * 128
    Hc = h_local + RP + WH                       # = h_local + 2*RP + 8
    Wc = r.width + RP + WW
    return WH, WW, Hc, Wc


def canvas_init_pallas(cfg: SceneConfig, h_local, fused: bool = False):
    """Padded canvas (C=0, T=1); bf16 with warp_canvas_fp32=False
    (halves the RMW DMA traffic; the oracle mirrors the per-step
    rounding).  ``fused`` must match the composite path that will
    consume it: the fused kernel uses canvas_geom's layout — [4, Hc, Wc]
    planes, or 2-D [Hc, Wc] with lane = 4*x + channel when interleaved
    (T on phase-3 lanes) — the unfused path the legacy pixel planes."""
    cdt = jnp.float32 if cfg.render.warp_canvas_fp32 else jnp.bfloat16
    if fused:
        g = canvas_geom(cfg, h_local)
        if g.ilv:
            lane = jax.lax.broadcasted_iota(jnp.int32, (g.Hc, g.Wc), 1)
            return jnp.where(lane % 4 == 3, 1.0, 0.0).astype(cdt)
        Hc, Wc = g.Hc, g.Wc
    else:
        _, _, Hc, Wc = _canvas_dims(cfg, h_local, fused)
    return jnp.concatenate([jnp.zeros((3, Hc, Wc), cdt),
                            jnp.ones((1, Hc, Wc), cdt)], axis=0)


def composite_chunk_pallas(canvas, images, geom, cfg: SceneConfig, y_start,
                           h_local, order=None):
    """Canvas composite of one ALREADY depth-ordered particle chunk as a
    Pallas kernel: sequential grid over particles, each step RMWs the
    particle's canvas window with explicit DMAs while the next image
    block is pipelined in.  ``order`` optionally permutes the chunk
    (used by the single-chunk fast path to avoid gathering the inputs).

    DMA offsets must respect the (8, 128) tiling, so the window origin is
    snapped DOWN to the tile grid and the window widened to
    [RP+8, RP+128-ish]; the image is placed at the sub-tile offset
    (dy, dx) inside the widened window by dynamic circular rolls of a
    buffer padded with the OVER identity (C=0, T=1) — wrapped elements
    land in the padding, so the roll is exact.

    The window RMW is DOUBLE-BUFFERED: the write-back of particle k
    overlaps the fetch/RMW of k+1 (the serial read-wait-modify-write-wait
    chain was latency-bound at ~5 ms for 1024 windows).  Correctness
    holds because k+1's fetch only races k's write-back when their
    canvas windows INTERSECT — precomputed per step (``ov``) and guarded
    by an explicit wait; buffer reuse is guarded by a wait on the
    write-back issued two steps ago."""
    r = cfg.render
    RP = r.warp_rect
    N = images.shape[0]
    WH, WW, Hc, Wc = _canvas_dims(cfg, h_local)

    if order is None:
        order = jnp.arange(N, dtype=jnp.int32)
    oy = jnp.clip(geom["sy0"] - jnp.asarray(y_start, jnp.int32) + RP,
                  0, Hc - WH).astype(jnp.int32)
    ox = jnp.clip(geom["sx0"] + RP, 0, Wc - WW).astype(jnp.int32)
    oy_al = (oy // 8) * 8
    ox_al = (ox // 128) * 128
    dy = oy - oy_al
    dx = ox - ox_al
    # window-overlap flags IN COMPOSITE ORDER: ov[k] = 1 iff window k
    # intersects window k-1 (then k's canvas fetch must wait k-1's
    # write-back)
    oy_k = oy_al[order]
    ox_k = ox_al[order]
    ov = ((jnp.abs(oy_k - jnp.roll(oy_k, 1)) < WH)
          & (jnp.abs(ox_k - jnp.roll(ox_k, 1)) < WW)).astype(jnp.int32)
    ov = ov.at[0].set(0)
    canvas0 = canvas

    def kernel(order_ref, oy_ref, ox_ref, dy_ref, dx_ref, ov_ref, img_ref,
               canvas_ref, out_ref, win, pad, sem_in, sem_out):
        k = pl.program_id(0)
        p = order_ref[k]
        b = jax.lax.rem(k, 2)
        y = pl.multiple_of(oy_ref[p], 8)
        x = pl.multiple_of(ox_ref[p], 128)

        def cout_desc(bb):
            # the write-back descriptor for buffer bb; offsets only give
            # the byte count, so waiting with CURRENT offsets is valid
            # for a copy started with earlier ones (same window shape)
            return pltpu.make_async_copy(
                win.at[bb], out_ref.at[:, pl.ds(y, WH), pl.ds(x, WW)],
                sem_out.at[bb])

        # hazard 1: buffer reuse — the write-back issued from this
        # buffer at k-2 (skip if it was already waited at k-1's overlap
        # guard, else the second wait would hang)
        @pl.when((k >= 2) & (ov_ref[jnp.maximum(k - 1, 0)] == 0))
        def _wait_reuse():
            cout_desc(b).wait()

        # hazard 2: canvas overlap with particle k-1's window
        @pl.when(ov_ref[k] == 1)
        def _wait_overlap():
            cout_desc(1 - b).wait()

        cin = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(y, WH), pl.ds(x, WW)], win.at[b],
            sem_in.at[b])
        cin.start()

        # place the image at (dy, dx) inside the widened window: the
        # identity ring (C=0, T=1) is built ONCE, each step rewrites only
        # the RP x RP image region, then circular-rolls by the sub-tile
        # offset (2-D rolls per channel — 3-D dynamic rotates do not
        # lower); wrapped elements land in the identity ring, so the
        # roll is exact.
        @pl.when(k == 0)
        def _init_ring():
            pad[:] = jnp.zeros((4, WH, WW), jnp.float32)
            pad[3] = jnp.ones((WH, WW), jnp.float32)

        img = img_ref[0].astype(jnp.float32)            # [4, RP, RP]
        pad[:, :RP, :RP] = img
        dyv = dy_ref[p]
        dxv = dx_ref[p]

        def place(ch):
            return pltpu.roll(pltpu.roll(pad[ch], dyv, axis=0),
                              dxv, axis=1)

        cin.wait()
        wref = win.at[b]
        Tw = wref[3].astype(jnp.float32)
        for ch in range(3):
            wref[ch] = (wref[ch].astype(jnp.float32)
                        + Tw * place(ch)).astype(canvas0.dtype)
        wref[3] = (Tw * place(3)).astype(canvas0.dtype)
        cout = cout_desc(b)
        cout.start()

        # drain: the final step waits its own write-back and (unless the
        # overlap guard above already did) the previous step's
        @pl.when(k == N - 1)
        def _drain_own():
            cout_desc(b).wait()
        if N > 1:
            @pl.when((k == N - 1) & (ov_ref[k] == 0))
            def _drain_prev():
                cout_desc(1 - b).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 4, RP, RP),
                         lambda k, o, y, x, d1, d2, v: (o[k], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 4, WH, WW), canvas0.dtype),
            pltpu.VMEM((4, WH, WW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, Hc, Wc), canvas0.dtype),
        input_output_aliases={7: 0},   # canvas input (after 6 prefetch
                                       # args + the image array)
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(order, oy_al, ox_al, dy, dx, ov, images, canvas0)
