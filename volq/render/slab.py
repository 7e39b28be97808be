"""The slab renderer — the gather-free TPU performance path (SURVEY.md §7
hard-part 1b: "trilinear sampling as matmuls against axis interpolation
matrices").

Why it exists: XLA's HBM gather on TPU runs at ~1e8 fetches/s (no hardware
gather — docs/DESIGN.md §1), so the exact per-ray renderer in
xla_render.py cannot be the hot path.  This renderer removes every gather
from the march:

  * Marching quadrature: ``steps`` planes at fixed LOCAL z (the volume's
    major axis), z_s = (s + 0.5)/steps in [0,1].  The z interpolation
    weight is then SHARED by every ray at a given step, so the density
    slab for step s is one z-lerp of two contiguous volume slices
    (z-major layout; see core/interp.py).
  * Per-ray in-plane bilinear sampling becomes a dense contraction:
    hat-function weight matrices Wx [P,tp,V], Wy [P,tp,V] are built with
    iota comparisons (pure VPU) and contracted against the slab on the
    MXU:  sigma = sum_jk Wx[..j] slab[jk] Wy[..k].  Measured ~58 G
    samples/s at V=64 vs ~1e7 samples/s for the gather march.
  * Rays marching toward -z see the planes back-to-front; both
    front-to-back and back-to-front accumulators are maintained and the
    correct one is selected PER RAY at the end (pure predication, no
    divergence).

Sampling semantics differ from xla_render.py (z-plane quadrature with
dt = plane spacing along the ray, clamped to the slab-test segment,
instead of per-ray uniform steps across the segment) and are defined by
their own scalar oracle, oracle/slab_cpu.py, to the same 1e-3 per-pixel
budget.  Lighting uses a per-frame baked light-transmittance volume
(volume/lightbake.py) sampled by the same machinery — the slab analogue
of the reference's per-sample secondary light march.

Slab fetch strategies by bank size M (selected statically from config):
  * M == 1 (shared volume): static dynamic-slice, zero per-pair traffic.
  * M <= ONEHOT_MAX_BANK: one-hot [P, M] matmul against all M slices —
    an MXU "gather" that is cheap precisely because M is small.
  * larger M (per-particle volumes): per-pair row gather of the two
    slices (bounded by HBM bandwidth, measured ~176 GB/s).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volq.core.aabb import ray_aabb
from volq.core.camera import pixel_rays
from volq.core.types import Camera, Light, Particles
from volq.render.binning import bin_particles, PairList
from volq.render.xla_render import (composite_pairs, assemble_image, _fade,
                                    _near_fade)
from volq.scene.config import SceneConfig

ONEHOT_MAX_BANK = 64
_DZ_EPS = 1e-6


def _hat_weights(g, size: int, dtype):
    """Dense 1-D linear-interpolation weights: W[..., j] = max(0, 1-|g-j|).
    For g in [0, V-1] this reproduces exactly the two-point lerp weights;
    built with broadcasting, no gather."""
    j = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(g[..., None] - j)).astype(dtype)


def _slab_at(volumes, vol_rows, z0, fz, dtype):
    """z-lerped density slab at plane cell (z0, fz) for every pair.

    volumes: [M, V, V, V] (z-major).  vol_rows: [P] bank indices.
    z0/fz: [] traced (same for all pairs — the plane grid is in local
    coordinates shared across pairs).

    Returns [V, V] when the bank is shared (M == 1: the einsum stays
    unbatched, no per-pair broadcast is materialized), else [P, V, V].
    """
    M, V = volumes.shape[0], volumes.shape[-1]
    fz = fz.astype(jnp.float32)
    if M == 1:
        sl = jax.lax.dynamic_slice(
            volumes, (0, z0, 0, 0), (1, 2, V, V))[0].astype(jnp.float32)
        return (sl[0] + (sl[1] - sl[0]) * fz).astype(dtype)   # [V,V]
    if M <= ONEHOT_MAX_BANK:
        sl = jax.lax.dynamic_slice(
            volumes, (0, z0, 0, 0), (M, 2, V, V)).astype(jnp.float32)
        lerped = (sl[:, 0] + (sl[:, 1] - sl[:, 0]) * fz).astype(dtype)
        onehot = (vol_rows[:, None] ==
                  jnp.arange(M, dtype=jnp.int32)[None, :]).astype(dtype)
        return jnp.einsum("pm,mjk->pjk", onehot, lerped,
                          preferred_element_type=dtype)       # [P,V,V]
    # Large banks: row gather of the two contiguous slices.
    rows2d = volumes.reshape(M * V, V * V)
    base = vol_rows * V + z0
    sl0 = rows2d[base].astype(jnp.float32)
    sl1 = rows2d[base + 1].astype(jnp.float32)
    return (sl0 + (sl1 - sl0) * fz).astype(dtype).reshape(-1, V, V)


from typing import Any, NamedTuple


class _PairChunk(NamedTuple):
    pid: Any
    tile: Any
    valid: Any


def _largest_divisor_leq(n: int, k: int) -> int:
    for c in range(min(k, n), 0, -1):
        if n % c == 0:
            return c
    return n


def _march_pairs_slab(pairs: PairList, particles: Particles, volumes,
                      camera: Camera, light: Light, cfg: SceneConfig,
                      tile_start=0, light_volumes=None):
    """March all kept pairs with z-plane quadrature, lax.map'd over pair
    chunks so the [chunk, tp, V] weight workspace stays bounded.
    Returns (C [P,tp,3], t [P,tp]) premultiplied color + transmittance."""
    P_total = pairs.pid.shape[0]
    chunk = cfg.render.slab_pair_chunk
    if chunk and 0 < chunk < P_total:
        chunk = _largest_divisor_leq(P_total, chunk)
        nc = P_total // chunk

        def one_chunk(ch):
            return _march_chunk_slab(_PairChunk(*ch), particles, volumes,
                                     camera, light, cfg, tile_start,
                                     light_volumes)

        C, T = jax.lax.map(one_chunk, (
            pairs.pid.reshape(nc, chunk),
            pairs.tile.reshape(nc, chunk),
            pairs.valid.reshape(nc, chunk)))
        tp = cfg.render.tile_h * cfg.render.tile_w
        return C.reshape(P_total, tp, 3), T.reshape(P_total, tp)
    return _march_chunk_slab(
        _PairChunk(pairs.pid, pairs.tile, pairs.valid), particles, volumes,
        camera, light, cfg, tile_start, light_volumes)


def _march_chunk_slab(pairs, particles: Particles, volumes,
                      camera: Camera, light: Light, cfg: SceneConfig,
                      tile_start=0, light_volumes=None):
    r = cfg.render
    tiles_x = r.width // r.tile_w
    tp = r.tile_h * r.tile_w
    V = volumes.shape[-1]
    S = r.steps
    wdt = jnp.float32 if r.slab_fp32 else jnp.bfloat16
    gtile = pairs.tile + jnp.asarray(tile_start, jnp.int32)

    pid = pairs.pid
    pos = particles.pos[pid]                       # [P,3]
    half = particles.size[pid][:, None]            # [P,1]
    albedo = particles.albedo[pid]                 # [P,3]
    vol_rows = particles.vol_idx[pid]              # [P]
    tau_life = particles.age[pid] / jnp.maximum(particles.lifetime[pid],
                                                1e-6)
    zview = (pos - camera.eye) @ camera.fwd
    scale = (r.density_scale * _fade(tau_life, r.fade_in, r.fade_out)
             * _near_fade(zview, r))[:, None]  # [P,1]

    ti = jnp.arange(tp, dtype=jnp.int32)
    px = (gtile % tiles_x)[:, None] * r.tile_w + (ti % r.tile_w)[None, :]
    py = jnp.minimum(gtile // tiles_x, r.height // r.tile_h - 1)[
        :, None] * r.tile_h + (ti // r.tile_w)[None, :]
    o, d = pixel_rays(camera, px, py, r.width, r.height,
                      cfg.camera.projection)        # [P,tp,3]

    lo = pos[:, None, :] - half[..., None]          # [P,1,3]
    hi = pos[:, None, :] + half[..., None]
    t0, t1 = ray_aabb(o, d, lo, hi)                 # [P,tp]
    seg = jnp.maximum(t1 - t0, 0.0)
    pvalid = pairs.valid[:, None]

    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    dz_sign = jnp.where(dz >= 0, 1.0, -1.0)
    dz_safe = jnp.where(jnp.abs(dz) < _DZ_EPS, dz_sign * _DZ_EPS, dz)
    ext = 2.0 * half                                # [P,1]
    # dt: plane spacing along the ray, clamped to the slab-test segment.
    dt = jnp.minimum(ext / S / jnp.abs(dz_safe), seg)
    lo_x, lo_y, lo_z = lo[..., 0], lo[..., 1], lo[..., 2]  # [P,1]

    gscale = (V - 1)

    # ---- optional per-pair in-plane windowing (cfg.render.slab_window) --
    # The tile's rays only touch a sub-rectangle of the slab; contracting
    # against a [Wn, Wn] window instead of [V, V] cuts the MXU work by
    # (V/Wn)^2.  The window is part of the slab SPEC: sampling coordinates
    # are clamped into the window rectangle derived from the tile's four
    # corner rays at the volume's near/far z faces (oracle/slab_cpu.py
    # computes the identical rectangle), so the oracle diff holds whether
    # or not a window truncates.
    Wn = r.slab_window
    windowed = 0 < Wn < V
    if windowed:
        cx = jnp.asarray([0, r.tile_w - 1, 0, r.tile_w - 1], jnp.int32)
        cy = jnp.asarray([0, 0, r.tile_h - 1, r.tile_h - 1], jnp.int32)
        pxc = (gtile % tiles_x)[:, None] * r.tile_w + cx[None, :]
        pyc = jnp.minimum(gtile // tiles_x, r.height // r.tile_h - 1)[
            :, None] * r.tile_h + cy[None, :]
        oc, dc = pixel_rays(camera, pxc, pyc, r.width, r.height,
                            cfg.camera.projection)       # [P,4,3]
        dzc = dc[..., 2]
        dzc = jnp.where(jnp.abs(dzc) < _DZ_EPS,
                        jnp.where(dzc >= 0, _DZ_EPS, -_DZ_EPS), dzc)
        gxs, gys = [], []
        for zeta_c in (0.0, 1.0):
            tc = (lo_z + zeta_c * ext - oc[..., 2]) / dzc   # [P,4]
            gxs.append((oc[..., 0] + tc * dc[..., 0] - lo_x) / ext * gscale)
            gys.append((oc[..., 1] + tc * dc[..., 1] - lo_y) / ext * gscale)
        gx_all = jnp.concatenate(gxs, axis=1)               # [P,8]
        gy_all = jnp.concatenate(gys, axis=1)
        wx0 = jnp.clip(jnp.floor(gx_all.min(axis=1)) - 1,
                       0, V - Wn).astype(jnp.int32)         # [P]
        wy0 = jnp.clip(jnp.floor(gy_all.min(axis=1)) - 1,
                       0, V - Wn).astype(jnp.int32)
        iW = jnp.arange(Wn, dtype=jnp.int32)
        iV = jnp.arange(V, dtype=jnp.int32)
        Sx = ((wx0[:, None] + iW[None, :])[:, :, None]
              == iV[None, None, :]).astype(wdt)             # [P,Wn,V]
        Sy = ((wy0[:, None] + iW[None, :])[:, :, None]
              == iV[None, None, :]).astype(wdt)
        wx0f = wx0.astype(jnp.float32)[:, None]
        wy0f = wy0.astype(jnp.float32)[:, None]

    def sample_plane(banks, zeta):
        """Sample every bank in ``banks`` at local plane z = zeta with ONE
        shared set of geometry + weight tensors (the weight builds dominate
        memory/VPU cost; lighting must not double them).
        Returns (list of values [P,tp] f32, inb, ts)."""
        z0 = jnp.clip(jnp.floor(zeta * gscale), 0, V - 2).astype(jnp.int32)
        fz = jnp.clip(zeta * gscale - z0.astype(jnp.float32), 0.0, 1.0)

        zw = lo_z + zeta * ext                      # [P,1] world z of plane
        ts = (zw - oz) / dz_safe                    # [P,tp]
        gx = (ox + ts * dx - lo_x) / ext * gscale
        gy = (oy + ts * dy - lo_y) / ext * gscale
        inb = ((ts > 0) & (gx >= 0) & (gx <= gscale)
               & (gy >= 0) & (gy <= gscale))
        if windowed:
            gxw = jnp.clip(gx, wx0f, wx0f + (Wn - 1)) - wx0f
            gyw = jnp.clip(gy, wy0f, wy0f + (Wn - 1)) - wy0f
            Wx = _hat_weights(gxw, Wn, wdt)                 # [P,tp,Wn]
            Wy = _hat_weights(gyw, Wn, wdt)
        else:
            Wx = _hat_weights(jnp.clip(gx, 0, gscale), V, wdt)  # [P,tp,V]
            Wy = _hat_weights(jnp.clip(gy, 0, gscale), V, wdt)
        Wyf = Wy.astype(jnp.float32)

        vals = []
        for bank in banks:
            slab = _slab_at(bank, vol_rows, z0, fz, wdt)
            if windowed:
                eqx = "pwv,vu->pwu" if slab.ndim == 2 else "pwv,pvu->pwu"
                t_ = jnp.einsum(eqx, Sx, slab, preferred_element_type=wdt)
                win = jnp.einsum("pwu,pxu->pwx", t_, Sy,
                                 preferred_element_type=wdt)    # [P,Wn,Wn]
                t1_ = jnp.einsum("ptj,pjk->ptk", Wx, win,
                                 preferred_element_type=jnp.float32)
            else:
                eq = "ptj,jk->ptk" if slab.ndim == 2 else "ptj,pjk->ptk"
                t1_ = jnp.einsum(eq, Wx, slab,
                                 preferred_element_type=jnp.float32)
            vals.append(jnp.sum(t1_ * Wyf, axis=-1))
        return vals, inb, ts

    l_col = jnp.asarray(light.color, jnp.float32)
    l_amb = jnp.asarray(light.ambient, jnp.float32)

    # Two passes (one contraction per loop body) — see the grouped march
    # for why fusing both banks into one step body is pathological.
    P_ = pid.shape[0]
    if light_volumes is not None:
        def light_step(s, buf):
            zeta = (s.astype(jnp.float32) + 0.5) / S
            vals, _, _ = sample_plane([light_volumes], zeta)
            return buf.at[s].set(vals[0])

        taus = jax.lax.fori_loop(0, S, light_step,
                                 jnp.zeros((S, P_, tp), jnp.float32))
    else:
        taus = None

    def step(s, carry):
        Cf, Cb, T = carry
        zeta = (s.astype(jnp.float32) + 0.5) / S
        vals, inb, _ = sample_plane([volumes], zeta)
        sigma = vals[0] * scale
        alpha = jnp.where(inb & pvalid, 1.0 - jnp.exp(-sigma * dt), 0.0)
        if taus is not None:
            # light volumes store unit-scale optical depth tau_raw; depth
            # is linear in extinction scale and world extent, so both are
            # applied here per particle (volume/lightbake.py).
            atten = jnp.exp(-scale * ext
                            * jnp.maximum(taus[s], 0.0))[..., None]
        else:
            atten = 1.0
        c = albedo[:, None, :] * (l_col * atten + l_amb)
        a3 = alpha[..., None]
        Cf = Cf + (T * alpha)[..., None] * c
        Cb = a3 * c + (1.0 - a3) * Cb
        T = T * (1.0 - alpha)
        return Cf, Cb, T

    P = pid.shape[0]
    Cf0 = jnp.zeros((P, tp, 3), jnp.float32)
    Cb0 = jnp.zeros((P, tp, 3), jnp.float32)
    T0 = jnp.ones((P, tp), jnp.float32)
    Cf, Cb, T = jax.lax.fori_loop(0, S, step, (Cf0, Cb0, T0))

    # Planes were visited in ascending z: that is front-to-back exactly for
    # rays with dz > 0; rays with dz < 0 take the back-to-front accumulator.
    C = jnp.where((dz >= 0)[..., None], Cf, Cb)
    return C, T


def _march_grouped_slab(pairs: PairList, particles: Particles, volumes,
                        camera: Camera, light: Light, cfg: SceneConfig,
                        tile_start=0, light_volumes=None):
    """Particle-grouped slab march over the candidate grid [N, MT].

    Marching per particle lets every step's density slab be fetched ONCE
    per particle and shared by all MT of its tiles through einsum batching
    ('nmtj,njk->nmtk') — the fetch dedup that makes per-particle volume
    banks (BASELINE config 3) bandwidth-feasible.  Padding cost: invalid
    candidate slots still march (masked); size MT to the real tile span.

    Returns (C [N*MT, tp, 3], t [N*MT, tp]); composite indexes rows via
    pairs.sort_idx.
    """
    r = cfg.render
    tiles_x = r.width // r.tile_w
    tiles_y = r.height // r.tile_h
    tp = r.tile_h * r.tile_w
    V = volumes.shape[-1]
    M = volumes.shape[0]
    S = r.steps
    MT = pairs.cand_tile.shape[1]
    N = pairs.cand_tile.shape[0]
    wdt = jnp.float32 if r.slab_fp32 else jnp.bfloat16
    Wn = r.slab_window
    windowed = 0 < Wn < V
    gscale = V - 1
    l_col = jnp.asarray(light.color, jnp.float32)
    l_amb = jnp.asarray(light.ambient, jnp.float32)
    rows2d = volumes.reshape(M * V, V * V) if M > ONEHOT_MAX_BANK else None
    lrows2d = (light_volumes.reshape(M * V, V * V)
               if light_volumes is not None and M > ONEHOT_MAX_BANK else None)

    def chunk_fn(args):
        cand_tile, cand_valid, pos, half, albedo, vol_rows, age, lifetime \
            = args
        Cp = cand_tile.shape[0]
        half = half[:, None]                        # [Cp,1]
        tau_life = age / jnp.maximum(lifetime, 1e-6)
        zview = (pos - camera.eye) @ camera.fwd
        scale = (r.density_scale * _fade(tau_life, r.fade_in, r.fade_out)
                 * _near_fade(zview, r))[:, None, None]

        gtile = cand_tile + jnp.asarray(tile_start, jnp.int32)  # [Cp,MT]
        ti = jnp.arange(tp, dtype=jnp.int32)
        px = ((gtile % tiles_x)[..., None] * r.tile_w
              + (ti % r.tile_w)[None, None, :])
        py = (jnp.minimum(gtile // tiles_x, tiles_y - 1)[..., None]
              * r.tile_h + (ti // r.tile_w)[None, None, :])
        o, d = pixel_rays(camera, px, py, r.width, r.height,
                          cfg.camera.projection)    # [Cp,MT,tp,3]

        lo = pos[:, None, None, :] - half[..., None, None]
        hi = pos[:, None, None, :] + half[..., None, None]
        t0, t1 = ray_aabb(o, d, lo, hi)             # [Cp,MT,tp]
        seg = jnp.maximum(t1 - t0, 0.0)
        pvalid = cand_valid[..., None]

        ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        dz_sign = jnp.where(dz >= 0, 1.0, -1.0)
        dz_safe = jnp.where(jnp.abs(dz) < _DZ_EPS, dz_sign * _DZ_EPS, dz)
        ext = 2.0 * half                            # [Cp,1]
        ext3 = ext[..., None]                       # [Cp,1,1]
        dt = jnp.minimum(ext3 / S / jnp.abs(dz_safe), seg)
        lo_x = lo[..., 0]
        lo_y = lo[..., 1]
        lo_z = lo[..., 2]                           # [Cp,1,1]

        if windowed:
            cx = jnp.asarray([0, r.tile_w - 1, 0, r.tile_w - 1], jnp.int32)
            cy = jnp.asarray([0, 0, r.tile_h - 1, r.tile_h - 1], jnp.int32)
            pxc = (gtile % tiles_x)[..., None] * r.tile_w + cx
            pyc = (jnp.minimum(gtile // tiles_x, tiles_y - 1)[..., None]
                   * r.tile_h + cy)
            oc, dc = pixel_rays(camera, pxc, pyc, r.width, r.height,
                                cfg.camera.projection)   # [Cp,MT,4,3]
            dzc = dc[..., 2]
            dzc = jnp.where(jnp.abs(dzc) < _DZ_EPS,
                            jnp.where(dzc >= 0, _DZ_EPS, -_DZ_EPS), dzc)
            loz_c = lo_z[:, :, 0][..., None]             # [Cp,1,1]
            lox_c = lo_x[:, :, 0][..., None]
            loy_c = lo_y[:, :, 0][..., None]
            ext_c = ext[..., None]                       # [Cp,1,1]
            gxs, gys = [], []
            for zeta_c in (0.0, 1.0):
                tc = (loz_c + zeta_c * ext_c - oc[..., 2]) / dzc
                gxs.append((oc[..., 0] + tc * dc[..., 0] - lox_c)
                           / ext_c * gscale)
                gys.append((oc[..., 1] + tc * dc[..., 1] - loy_c)
                           / ext_c * gscale)
            gx_all = jnp.concatenate(gxs, axis=-1)       # [Cp,MT,8]
            gy_all = jnp.concatenate(gys, axis=-1)
            wx0 = jnp.clip(jnp.floor(gx_all.min(axis=-1)) - 1,
                           0, V - Wn).astype(jnp.int32)  # [Cp,MT]
            wy0 = jnp.clip(jnp.floor(gy_all.min(axis=-1)) - 1,
                           0, V - Wn).astype(jnp.int32)
            iW = jnp.arange(Wn, dtype=jnp.int32)
            iV = jnp.arange(V, dtype=jnp.int32)
            Sx = ((wx0[..., None] + iW)[..., None]
                  == iV).astype(wdt)                     # [Cp,MT,Wn,V]
            Sy = ((wy0[..., None] + iW)[..., None]
                  == iV).astype(wdt)
            wx0f = wx0.astype(jnp.float32)[..., None]
            wy0f = wy0.astype(jnp.float32)[..., None]

        def fetch_slab(bank, brows, z0, fz):
            """Per-particle z-lerped slab: [V,V] (M==1) or [Cp,V,V]."""
            if M == 1:
                sl = jax.lax.dynamic_slice(
                    bank, (0, z0, 0, 0), (1, 2, V, V))[0].astype(jnp.float32)
                return (sl[0] + (sl[1] - sl[0]) * fz).astype(wdt)
            if M <= ONEHOT_MAX_BANK:
                sl = jax.lax.dynamic_slice(
                    bank, (0, z0, 0, 0), (M, 2, V, V)).astype(jnp.float32)
                lerped = (sl[:, 0] + (sl[:, 1] - sl[:, 0]) * fz).astype(wdt)
                onehot = (vol_rows[:, None]
                          == jnp.arange(M, dtype=jnp.int32)).astype(wdt)
                return jnp.einsum("nm,mjk->njk", onehot, lerped,
                                  preferred_element_type=wdt)
            base = vol_rows * V + z0
            sl0 = brows[base].astype(jnp.float32)
            sl1 = brows[base + 1].astype(jnp.float32)
            return (sl0 + (sl1 - sl0) * fz).astype(wdt).reshape(Cp, V, V)

        def sample_plane(banks, zeta):
            """Sample every (bank, brows) in ``banks`` at plane zeta with
            ONE shared set of geometry + weight tensors (the weight builds
            dominate memory/VPU cost; lighting must not double them).
            Returns (list of values [Cp,MT,tp], inb, ts)."""
            z0 = jnp.clip(jnp.floor(zeta * gscale), 0, V - 2).astype(
                jnp.int32)
            fz = jnp.clip(zeta * gscale - z0.astype(jnp.float32), 0.0, 1.0)

            zw = lo_z + zeta * ext3
            ts = (zw - oz) / dz_safe                     # [Cp,MT,tp]
            gx = (ox + ts * dx - lo_x) / ext3 * gscale
            gy = (oy + ts * dy - lo_y) / ext3 * gscale
            inb = ((ts > 0) & (gx >= 0) & (gx <= gscale)
                   & (gy >= 0) & (gy <= gscale))
            if windowed:
                gxw = jnp.clip(gx, wx0f, wx0f + (Wn - 1)) - wx0f
                gyw = jnp.clip(gy, wy0f, wy0f + (Wn - 1)) - wy0f
                Wx = _hat_weights(gxw, Wn, wdt)          # [Cp,MT,tp,Wn]
                Wy = _hat_weights(gyw, Wn, wdt)
            else:
                Wx = _hat_weights(jnp.clip(gx, 0, gscale), V, wdt)
                Wy = _hat_weights(jnp.clip(gy, 0, gscale), V, wdt)
            Wyf = Wy.astype(jnp.float32)

            vals = []
            for bank, brows in banks:
                slab = fetch_slab(bank, brows, z0, fz)
                if windowed:
                    eqx = ("nmwv,vu->nmwu" if slab.ndim == 2
                           else "nmwv,nvu->nmwu")
                    t_ = jnp.einsum(eqx, Sx, slab,
                                    preferred_element_type=wdt)
                    win = jnp.einsum("nmwu,nmxu->nmwx", t_, Sy,
                                     preferred_element_type=wdt)
                    t1_ = jnp.einsum("nmtj,nmjk->nmtk", Wx, win,
                                     preferred_element_type=jnp.float32)
                else:
                    eq = ("nmtj,jk->nmtk" if slab.ndim == 2
                          else "nmtj,njk->nmtk")
                    t1_ = jnp.einsum(eq, Wx, slab,
                                     preferred_element_type=jnp.float32)
                vals.append(jnp.sum(t1_ * Wyf, axis=-1))
            return vals, inb, ts

        # Two passes, ONE contraction per step each: putting both the
        # density and light contractions in one loop body breaks XLA's
        # matmul/reduction fusion (the [Cp,MT,tp,V] intermediate spills;
        # measured 15x slowdown). The light pass stores per-step optical
        # depth; the march pass consumes it.
        if light_volumes is not None:
            def light_step(s, buf):
                zeta = (s.astype(jnp.float32) + 0.5) / S
                vals, _, _ = sample_plane([(light_volumes, lrows2d)], zeta)
                return buf.at[s].set(vals[0])

            taus = jax.lax.fori_loop(
                0, S, light_step,
                jnp.zeros((S, Cp, MT, tp), jnp.float32))
        else:
            taus = None

        def step(s, carry):
            Cf, Cb, T = carry
            zeta = (s.astype(jnp.float32) + 0.5) / S
            vals, inb, _ = sample_plane([(volumes, rows2d)], zeta)
            sigma = vals[0] * scale
            alpha = jnp.where(inb & pvalid,
                              1.0 - jnp.exp(-sigma * dt), 0.0)
            if taus is not None:
                atten = jnp.exp(-scale * ext3
                                * jnp.maximum(taus[s], 0.0))[..., None]
            else:
                atten = 1.0
            c = albedo[:, None, None, :] * (l_col * atten + l_amb)
            a3 = alpha[..., None]
            Cf = Cf + (T * alpha)[..., None] * c
            Cb = a3 * c + (1.0 - a3) * Cb
            T = T * (1.0 - alpha)
            return Cf, Cb, T

        Cf0 = jnp.zeros((Cp, MT, tp, 3), jnp.float32)
        Cb0 = jnp.zeros((Cp, MT, tp, 3), jnp.float32)
        T0 = jnp.ones((Cp, MT, tp), jnp.float32)
        Cf, Cb, T = jax.lax.fori_loop(0, S, step, (Cf0, Cb0, T0))
        C = jnp.where((dz >= 0)[..., None], Cf, Cb)
        return C, T

    Cp = _largest_divisor_leq(N, max(cfg.render.slab_particle_chunk, 1))
    nc = N // Cp

    def reshape_chunks(x):
        return x.reshape((nc, Cp) + x.shape[1:])

    args = (pairs.cand_tile, pairs.cand_valid, particles.pos,
            particles.size, particles.albedo, particles.vol_idx,
            particles.age, particles.lifetime)
    if nc > 1:
        C, T = jax.lax.map(chunk_fn, tuple(reshape_chunks(a) for a in args))
    else:
        C, T = chunk_fn(args)
        C, T = C[None], T[None]
    return C.reshape(N * MT, tp, 3), T.reshape(N * MT, tp)


def render_slab_tiles(particles: Particles, volumes, camera: Camera,
                      light: Light, cfg: SceneConfig, tile_start=0,
                      n_tiles_local: int | None = None, light_volumes=None):
    """Slab-rendered flat tile range (same contract as render_tiles)."""
    pairs = bin_particles(particles, camera, cfg, tile_start=tile_start,
                          n_tiles_local=n_tiles_local)
    if cfg.render.slab_grouped:
        C_pair, t_pair = _march_grouped_slab(
            pairs, particles, volumes, camera, light, cfg,
            tile_start=tile_start, light_volumes=light_volumes)
        tiles = composite_pairs(pairs, C_pair, t_pair, cfg,
                                n_tiles_local=n_tiles_local,
                                row_map=pairs.sort_idx)
    else:
        C_pair, t_pair = _march_pairs_slab(
            pairs, particles, volumes, camera, light, cfg,
            tile_start=tile_start, light_volumes=light_volumes)
        tiles = composite_pairs(pairs, C_pair, t_pair, cfg,
                                n_tiles_local=n_tiles_local)
    return tiles, pairs.stats


def render_slab(particles: Particles, volumes, camera: Camera, light: Light,
                cfg: SceneConfig, light_volumes=None):
    """Render one full frame with the slab engine. ([H,W,4] f32, stats)."""
    tiles, stats = render_slab_tiles(particles, volumes, camera, light, cfg,
                                     light_volumes=light_volumes)
    return assemble_image(tiles, cfg), stats
