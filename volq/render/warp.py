"""The warp renderer — per-particle shear-warp impostors, the TPU fast
path (round-2 redesign; see docs/DESIGN.md §6).

Why it exists: the slab engine's per-(tile, particle) march costs
tp * V * V MACs per tile-step (~20 TFLOP/frame for BASELINE config 3) —
no amount of tuning reaches the 500 Mrays/s target from there.  This
engine is the classic shear-warp factorization rebuilt for the MXU:

  1. **Slope-grid march** (per particle, once — not per tile): grid cell
     (w, u) is the camera ray through pixel row ``sy0+w`` and "ray
     x-coordinate" ``rx_u`` (perspective: the slope dx/dz of the ray
     through pixel column ``sx0+u`` at the particle's center row;
     orthographic: the ray's x-intercept).  On every marching plane
     z = const the sample position is then a per-particle affine function
     of rx_u ALONE and of ry_w ALONE — so the trilinear sampling of the
     whole grid factorizes into two dense MXU matmuls per (particle,
     step): sigma = Wy @ slab @ Wx^T, with hat-function weight matrices
     built from iota comparisons (no gather anywhere).  Cost:
     RP*V*(V+RP) MACs per particle-step — ~50x less than the slab
     engine's per-tile formulation for config 3.
  2. **Fan correction** (the "warp" of shear-warp): grid columns match
     pixel columns exactly at the particle's center row; away from it the
     true pixel ray coordinate drifts by a smoothly varying sub-cell to
     few-cell amount (the perspective "fan" of a pitched/yawed camera).
     The pixel value is the 1-D linear interpolation of the marched grid
     at u* = i + delta(i, j), evaluated as a masked sum over static
     integer shifts (|delta| <= warp_shift_max, clamped + counted).
     Cameras with no yaw/roll need no row correction (detected
     statically); yawed cameras get the symmetric row pass.
  3. **Depth-ordered composite**: the per-particle premultiplied
     (C, T) images land on a padded canvas through dynamic-slice
     front-to-back OVER in global view-z order — the oracle's own loop
     structure, with no tile binning, no pair lists, and no per-tile
     depth caps at all.

Approximations vs the exact engine (all mirrored bit-for-bit by the
oracle, oracle/warp_cpu.py, so the 1e-3 oracle diff is exact):
  * each pixel's radiance is interpolated between the two neighboring
    grid rays (sub-pixel ray offset, first-order-exact);
  * particles whose AABB straddles the eye's z-plane march only their
    z-planes IN FRONT of the eye (the per-step scalar t>0 test) with the
    ray segment clamped to start at the eye plane — the same geometry
    the exact engine integrates, sampled on the front planes only.
    Straddlers are counted (``straddled``) because their screen
    footprint is often rect-clipped (``rect_overflow``);
  * screen footprints larger than ``warp_rect`` are clipped (counted as
    ``rect_overflow``).

Lighting samples a baked light-transmittance volume (volume/lightbake.py)
through the same two-matmul machinery — both banks are stacked into ONE
batched contraction per step, keeping a single fused dot per loop body
(docs/DESIGN.md §1b: two separate contractions per body break fusion).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volq.core.types import Camera, Light, Particles
from volq.render.xla_render import _fade, _near_fade
from volq.scene.config import SceneConfig

_EPS = 1e-6
ONEHOT_MAX_BANK = 64


# March-axis support (round-1 VERDICT item 8): the engine's math marches
# planes of constant ENGINE-z.  A camera looking along world x or y would
# see its rays nearly parallel to those planes (quality collapse, dt
# clamped by the slab segment), so the marching axis is chosen statically
# as the world axis most aligned with the camera forward, and the whole
# problem is rotated into engine coordinates by a CYCLIC world-axis
# permutation of the camera vectors, particle positions, and volume axes
# (the sampled field is unchanged; every formula is coordinate-wise).
# Two candidate permutations per march axis — a cyclic (even) one and an
# axis-swap (odd) one; both are representation isometries (every scene
# element is permuted consistently, so the image is unchanged — verified
# by test_warp_side_view_dominant_axis against the exact engine).  The
# choice matters because the engine's ray grid indexes rx by pixel COLUMN
# and ry by ROW: the permutation must keep the camera's right/up roughly
# aligned with engine x/y or the grid degenerates (a 90-degree "roll").
# (vec perm vp: engine component i = world component vp[i];
#  vol perm ap: engine array dims from the world [M, z, x, y] array)
_MARCH_PERMS = {
    0: (((1, 2, 0), (0, 2, 3, 1)), ((2, 1, 0), (0, 2, 1, 3))),
    1: (((2, 0, 1), (0, 3, 1, 2)), ((0, 2, 1), (0, 3, 2, 1))),
    2: (((0, 1, 2), (0, 1, 2, 3)), ((1, 0, 2), (0, 1, 3, 2))),
}


def _static_camera(cfg: SceneConfig):
    from volq.core.camera import make_camera
    return make_camera(cfg.camera.eye, cfg.camera.look_at, cfg.camera.up,
                       fov_y_deg=cfg.camera.fov_y_deg, aspect=1.0,
                       ortho_half_h=cfg.camera.ortho_half_h,
                       projection=cfg.camera.projection)


def march_axis(cfg: SceneConfig) -> int:
    """World axis (0=x, 1=y, 2=z) most aligned with the camera forward —
    the static marching axis."""
    cam = _static_camera(cfg)
    f = [abs(float(cam.fwd[0])), abs(float(cam.fwd[1])),
         abs(float(cam.fwd[2]))]
    return int(max(range(3), key=lambda i: f[i]))


def _march_perm(cfg: SceneConfig):
    """Static (vec perm, vol perm) for the config's march axis, choosing
    the candidate that best aligns camera right->engine x, up->engine y."""
    cam = _static_camera(cfg)
    axis = march_axis(cfg)

    def score(vp):
        return (abs(float(cam.right[vp[0]]))
                + abs(float(cam.up[vp[1]])))

    return max(_MARCH_PERMS[axis], key=lambda cand: score(cand[0]))


def _permute_vec(v, perm):
    return jnp.stack([v[perm[0]], v[perm[1]], v[perm[2]]])


def permute_for_march(particles: Particles, volumes, camera: Camera,
                      light_volumes, cfg: SceneConfig):
    """Rotate the scene into engine coordinates for the config's static
    march axis (identity when already z-marching with an unrolled
    camera).  Mirrored by the oracle."""
    vp, ap = _march_perm(cfg)
    if vp == (0, 1, 2):
        return particles, volumes, camera, light_volumes
    particles = particles._replace(
        pos=particles.pos[:, list(vp)], vel=particles.vel[:, list(vp)])
    camera = camera._replace(
        eye=_permute_vec(camera.eye, vp), right=_permute_vec(camera.right,
                                                             vp),
        up=_permute_vec(camera.up, vp), fwd=_permute_vec(camera.fwd, vp))
    volumes = volumes.transpose(ap)
    if light_volumes is not None:
        light_volumes = light_volumes.transpose(ap)
    return particles, volumes, camera, light_volumes


def _march_z_consts(S: int, V: int):
    """The (z0, fz) z-lerp constants of every marching step — STATIC,
    computed with the same fp32 arithmetic as the kernel so a pre-lerped
    slab bank is bit-identical to the in-kernel lerp."""
    import numpy as np
    gsc = np.float32(V - 1)
    out = []
    for s in range(S):
        zeta = (np.float32(s) + np.float32(0.5)) / np.float32(S)
        gz = zeta * gsc
        z0f = np.clip(np.float32(np.floor(gz)), np.float32(0.0),
                      np.float32(V - 2))
        fz = np.clip(gz - z0f, np.float32(0.0), np.float32(1.0))
        out.append((int(z0f), float(fz)))
    return out


def _slab_x_consts(VX: int, V: int):
    """The (k0, fx) x-resample constants mapping the downsampled grid
    point i to its align-corners position i*(V-1)/(VX-1) on the original
    grid — STATIC, same fp32 arithmetic as _march_z_consts so the oracle
    mirror is bit-identical."""
    import numpy as np
    out = []
    for i in range(VX):
        p = np.float32(i) * np.float32(V - 1) / np.float32(VX - 1)
        k0 = np.clip(np.float32(np.floor(p)), np.float32(0.0),
                     np.float32(V - 2))
        f = np.clip(p - k0, np.float32(0.0), np.float32(1.0))
        out.append((int(k0), float(f)))
    return out


def slab_vx_eff(cfg: SceneConfig, V: int) -> int:
    """Effective x-extent of the baked slab banks: render.warp_slab_vx
    when the config uses slab banks AND the march is telescoped (unlit
    or light_mode="center" — the per-step lit contraction slices the
    merged dot1 at V-lane offsets, which Mosaic requires 128-aligned),
    else V.  The x (sublane) axis is the ONLY resampleable one: the
    slab's lane axis (y) must stay a 128-multiple and z is already the
    S-step slab selection."""
    r = cfg.render
    vx = r.warp_slab_vx
    if vx <= 0 or vx >= V or not use_slab_banks(cfg, V):
        return V
    lit = r.light_steps > 0
    if lit and r.light_mode != "center":
        return V
    return vx


def bake_march_slabs(volumes, S: int, dtype, vx: int = 0):
    """Pre-lerp the z slabs every marching step reads: [M, V, V, V] ->
    [M, S, V, V] with slab[m, s] = (1-fz_s) vol[m, z0_s] + fz_s
    vol[m, z0_s+1] (fp32 lerp, cast to the working dtype — the kernel's
    exact math).  ``volumes`` must already be in ENGINE (march-permuted)
    coordinates.  Cuts the march kernel's HBM traffic from V^3 to S*V^2
    per particle and deletes the per-step z-lerp.

    ``vx`` (see slab_vx_eff): additionally resample the slab's x
    (sublane) axis to vx points by align-corners fp32 lerp -> [M, S, vx,
    V].  The kernel then builds its WxT hat weights on the vx grid
    (gscx = vx-1), cutting slab DMA, dot FLOPs and WxT VPU build by
    vx/V.  Pure-lerp subsampling (no prefilter) keeps the math an exact
    elementwise mirror of the oracle; the PSNR gate (bench/psnr_c3.py)
    decides per preset whether the mild x-lowpass is visually free."""
    V = volumes.shape[-1]
    consts = _march_z_consts(S, V)
    a = jnp.stack([volumes[:, z0] for z0, _ in consts],
                  axis=1).astype(jnp.float32)
    b = jnp.stack([volumes[:, z0 + 1] for z0, _ in consts],
                  axis=1).astype(jnp.float32)
    fz = jnp.asarray([f for _, f in consts],
                     jnp.float32)[None, :, None, None]
    bank = a + (b - a) * fz
    if vx and vx != V:
        xc = _slab_x_consts(vx, V)
        k0 = jnp.asarray([k for k, _ in xc], jnp.int32)
        fx = jnp.asarray([f for _, f in xc],
                         jnp.float32)[None, None, :, None]
        ka = jnp.take(bank, k0, axis=2)
        kb = jnp.take(bank, k0 + 1, axis=2)
        bank = ka + (kb - ka) * fx
    return bank.astype(dtype)


def use_slab_banks(cfg: SceneConfig, V: int) -> bool:
    """Slab banks pay when they shrink traffic (S < V) and the
    per-particle [S, V, V] block fits the VMEM budget (double-buffered,
    two banks when lit)."""
    r = cfg.render
    if not r.warp_pallas or r.engine != "warp":
        return False
    itemsize = 4 if r.warp_fp32 else 2
    lit = r.light_steps > 0
    block = r.steps * V * V * itemsize
    return r.steps < V and (1 + lit) * 2 * block <= 9 * 2 ** 20


def bake_slab_banks(volumes, light_volumes, cfg: SceneConfig):
    """World-coordinate entry point: permute the volume bank(s) into
    engine coordinates for the config's march axis, then bake the
    marching slab banks.  Returns (density, light-or-None) or None when
    banks don't pay for this config (render_warp_canvas then streams
    volumes directly).  Cache the result across frames for static scenes
    (engine/loop.cached_slab_banks)."""
    V = volumes.shape[-1]
    if not use_slab_banks(cfg, V):
        return None
    _, ap = _march_perm(cfg)
    if ap != (0, 1, 2, 3):
        volumes = volumes.transpose(ap)
        if light_volumes is not None:
            light_volumes = light_volumes.transpose(ap)
    wdt = jnp.float32 if cfg.render.warp_fp32 else jnp.bfloat16
    S = cfg.render.steps
    vx = slab_vx_eff(cfg, V)
    dens = bake_march_slabs(volumes, S, wdt, vx)
    lite = (bake_march_slabs(light_volumes, S, wdt, vx)
            if light_volumes is not None and cfg.render.light_steps > 0
            else None)
    return (dens, lite)


def march_rect(cfg: SceneConfig) -> int:
    """Effective march-grid resolution RM.  The march grid only needs to
    resolve the VOLUME's detail across the footprint (~V voxels), not the
    screen rect's pixel count — marching RM < RP rays and upsampling the
    accumulated (linear, pre-exp) planes to the rect in the epilogue cuts
    the march cost by RM/RP (dot1, weights) and (RM/RP)^2 (dot2)."""
    r = cfg.render
    RM = r.warp_march_rect
    if not RM or RM >= r.warp_rect:
        return r.warp_rect
    return RM


def upsample_weights(RP: int, RM: int):
    """Constant hat-weight pair (Uy [RP, RM], Ux [RM, RP]) resampling the
    endpoint-aligned RM march grid to the RP rect: screen cell i reads
    march coordinate p_i = i * (RM-1)/(RP-1) (fp32; mirrored by the
    oracle).  Rows sum to 1, so T = 1 - P2 survives the upsample."""
    import numpy as np
    ratio = np.float32(RM - 1) / np.float32(RP - 1)
    p = (np.arange(RP, dtype=np.float32) * ratio)[:, None]    # [RP, 1]
    m = np.arange(RM, dtype=np.float32)[None, :]              # [1, RM]
    Uy = np.maximum(np.float32(0.0), np.float32(1.0) - np.abs(p - m))
    return Uy, np.ascontiguousarray(Uy.T)


def needs_row_fan(cfg: SceneConfig) -> bool:
    """True when the pixel->ray-coordinate map's row coordinate depends on
    the pixel column (yawed or rolled camera IN ENGINE COORDINATES),
    requiring the symmetric row correction pass.  Static."""
    cam = _static_camera(cfg)
    vp, _ = _march_perm(cfg)
    right = [float(cam.right[i]) for i in vp]
    up = [float(cam.up[i]) for i in vp]
    return bool(abs(right[2]) > 1e-6 or abs(right[1]) > 1e-6
                or abs(up[0]) > 1e-6)


def ray_coords(camera: Camera, px, py, W, H, projection: str):
    """Ray coordinates (rx, ry) of the pixel rays through (px+.5, py+.5):
    perspective: slopes (dx/dz, dy/dz) of the eye ray; orthographic: the
    ray's (x, y) intercept with the z=0 plane.  Pure fp32 elementwise
    (mirrored by oracle/warp_cpu.py)."""
    ndx = (px.astype(jnp.float32) + 0.5) / W * 2.0 - 1.0
    ndy = 1.0 - (py.astype(jnp.float32) + 0.5) / H * 2.0
    ox = ndx * camera.scale_x
    oy = ndy * camera.scale_y
    if projection == "persp":
        dx = camera.fwd[0] + ox * camera.right[0] + oy * camera.up[0]
        dy = camera.fwd[1] + ox * camera.right[1] + oy * camera.up[1]
        dz = camera.fwd[2] + ox * camera.right[2] + oy * camera.up[2]
        dz = jnp.where(jnp.abs(dz) < _EPS,
                       jnp.where(dz >= 0, _EPS, -_EPS), dz)
        return dx / dz, dy / dz
    # ortho: o = eye + ox*right + oy*up, d = fwd; intercept at z = 0.
    o_x = camera.eye[0] + ox * camera.right[0] + oy * camera.up[0]
    o_y = camera.eye[1] + ox * camera.right[1] + oy * camera.up[1]
    o_z = camera.eye[2] + ox * camera.right[2] + oy * camera.up[2]
    fz = camera.fwd[2]
    fz = jnp.where(jnp.abs(fz) < _EPS, jnp.where(fz >= 0, _EPS, -_EPS), fz)
    kx = camera.fwd[0] / fz
    ky = camera.fwd[1] / fz
    return o_x - o_z * kx, o_y - o_z * ky


def _plane_pos_coeffs(camera: Camera, projection: str):
    """pos_x(zw) = c0x(zw) + c1x(zw) * rx (same for y).  Returns a function
    zw -> (c0x, c1x, c0y, c1y) of a scalar/array zw."""
    if projection == "persp":
        def coeffs(zw):
            c1 = zw - camera.eye[2]
            return (jnp.broadcast_to(camera.eye[0], zw.shape), c1,
                    jnp.broadcast_to(camera.eye[1], zw.shape), c1)
        return coeffs
    fz = camera.fwd[2]
    fz = jnp.where(jnp.abs(fz) < _EPS, jnp.where(fz >= 0, _EPS, -_EPS), fz)
    kx = camera.fwd[0] / fz
    ky = camera.fwd[1] / fz

    def coeffs(zw):
        one = jnp.ones_like(zw)
        return zw * kx, one, zw * ky, one
    return coeffs


def _grid_geometry(particles: Particles, camera: Camera, cfg: SceneConfig,
                   y_start, h_local):
    """Per-particle validity, rect origin, grid ray coordinates, and
    screen-center projection.  Returns dict of [N]/[N,RP] arrays + stats
    pieces.  All fp32, mirrored by the oracle."""
    r = cfg.render
    RP = r.warp_rect
    W, H = r.width, r.height
    proj = cfg.camera.projection
    pos = particles.pos.astype(jnp.float32)
    half = particles.size.astype(jnp.float32)

    rel = pos - camera.eye
    vx = rel @ camera.right
    vy = rel @ camera.up
    vz = rel @ camera.fwd
    if proj == "persp":
        vz_safe = jnp.maximum(vz, jnp.float32(1e-3))
        px_c = (vx / (vz_safe * camera.scale_x) + 1.0) * (0.5 * W)
        py_c = (1.0 - vy / (vz_safe * camera.scale_y)) * (0.5 * H)
        in_front = vz > 1e-3
        dzp = pos[:, 2] - camera.eye[2]
        szn = jnp.where(dzp >= 0, 1.0, -1.0)
        # straddlers (AABB crossing the eye z-plane) RENDER: the march
        # masks the planes behind the eye per step and the slab segment
        # clamps at t = 0, so only the front part integrates — counted
        # here because their footprints are often rect-clipped
        straddle = jnp.abs(dzp) <= half * 1.05
    else:
        px_c = (vx / camera.scale_x + 1.0) * (0.5 * W)
        py_c = (1.0 - vy / camera.scale_y) * (0.5 * H)
        in_front = jnp.ones_like(vz, bool)
        fz = camera.fwd[2]
        szn = jnp.broadcast_to(jnp.where(fz >= 0, 1.0, -1.0), vz.shape)
        straddle = jnp.zeros_like(vz, bool)

    alive = particles.age < particles.lifetime
    sx0 = (jnp.round(px_c) - RP // 2).astype(jnp.int32)
    sy0 = (jnp.round(py_c) - RP // 2).astype(jnp.int32)

    y_start = jnp.asarray(y_start, jnp.int32)
    on_screen = ((sx0 > -RP) & (sx0 < W)
                 & (sy0 > y_start - RP) & (sy0 < y_start + h_local))
    valid = alive & in_front & on_screen
    if r.near_fade_start > 0.0:
        valid = valid & (vz > r.near_fade_end)

    tau_life = particles.age / jnp.maximum(particles.lifetime, 1e-6)
    scale = (r.density_scale * _fade(tau_life, r.fade_in, r.fade_out)
             * _near_fade(vz, r))

    # Grid ray coordinates: column u samples pixel (sx0+u) at the
    # CONTINUOUS center row py_c (so the grid depends continuously on the
    # particle state — only border clipping feels rect off-by-ones);
    # row w samples pixel row (sy0+w) at the center column px_c.
    # With warp_march_rect, the RM march columns are endpoint-aligned
    # across the same rect (spacing (RP-1)/(RM-1) pixels; == 1.0 exactly
    # when RM == RP, so the march grid is unchanged then).
    RM = march_rect(cfg)
    uu = jnp.arange(RM, dtype=jnp.float32) \
        * jnp.float32((RP - 1) / max(RM - 1, 1))
    pxu = sx0[:, None].astype(jnp.float32) + uu[None, :]
    pyw = sy0[:, None].astype(jnp.float32) + uu[None, :]
    rx_u, _ = ray_coords(camera, pxu, jnp.broadcast_to(py_c[:, None],
                                                       pxu.shape) - 0.5,
                         W, H, proj)
    _, ry_w = ray_coords(camera, jnp.broadcast_to(px_c[:, None],
                                                  pyw.shape) - 0.5, pyw,
                         W, H, proj)
    # NOTE: ray_coords adds +0.5 internally; px_c/py_c are already pixel
    # coordinates of the center, hence the -0.5 above.

    # Footprint overflow (conservative corner-projection rect).
    signs = jnp.asarray([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                         for sz in (-1, 1)], jnp.float32)
    corners = pos[:, None, :] + half[:, None, None] * signs[None]
    crel = corners - camera.eye
    cvx = crel @ camera.right
    cvy = crel @ camera.up
    cvz = crel @ camera.fwd
    if proj == "persp":
        cvz = jnp.maximum(cvz, 1e-3)
        cpx = (cvx / (cvz * camera.scale_x) + 1.0) * (0.5 * W)
        cpy = (1.0 - cvy / (cvz * camera.scale_y)) * (0.5 * H)
    else:
        cpx = (cvx / camera.scale_x + 1.0) * (0.5 * W)
        cpy = (1.0 - cvy / camera.scale_y) * (0.5 * H)
    foot_w = cpx.max(1) - cpx.min(1)
    foot_h = cpy.max(1) - cpy.min(1)
    rect_overflow = jnp.sum((valid & ((foot_w > RP) | (foot_h > RP)))
                            .astype(jnp.int32))

    stats = {
        "alive": jnp.sum(alive.astype(jnp.int32)),
        "rendered": jnp.sum(valid.astype(jnp.int32)),
        "straddled": jnp.sum((valid & straddle).astype(jnp.int32)),
        "rect_overflow": rect_overflow,
    }
    return dict(px_c=px_c, py_c=py_c, sx0=sx0, sy0=sy0, szn=szn,
                valid=valid, scale=scale, rx_u=rx_u, ry_w=ry_w,
                vz=vz, foot_w=foot_w, foot_h=foot_h), stats


def _hat(g, size: int, dtype):
    """Dense 1-D hat weights W[..., v] = max(0, 1 - |g - v|)."""
    v = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(g[..., None] - v)).astype(dtype)


def _fetch_slabs(volumes, rows2d, vol_rows, z0, fz, M, V, dtype):
    """z-lerped [V, V] slab(s) at (z0, fz) for a particle chunk.
    Returns [V,V] (shared bank) or [c,V,V].  Same strategy ladder as
    render/slab.py (shared / one-hot matmul / row gather)."""
    fz = fz.astype(jnp.float32)
    if M == 1:
        sl = jax.lax.dynamic_slice(
            volumes, (0, z0, 0, 0), (1, 2, V, V))[0].astype(jnp.float32)
        return (sl[0] + (sl[1] - sl[0]) * fz).astype(dtype)
    if M <= ONEHOT_MAX_BANK:
        sl = jax.lax.dynamic_slice(
            volumes, (0, z0, 0, 0), (M, 2, V, V)).astype(jnp.float32)
        lerped = (sl[:, 0] + (sl[:, 1] - sl[:, 0]) * fz).astype(dtype)
        onehot = (vol_rows[:, None]
                  == jnp.arange(M, dtype=jnp.int32)).astype(dtype)
        return jnp.einsum("nm,mjk->njk", onehot, lerped,
                          preferred_element_type=dtype)
    base = vol_rows * V + z0
    sl0 = rows2d[base].astype(jnp.float32)
    sl1 = rows2d[base + 1].astype(jnp.float32)
    c = vol_rows.shape[0]
    return (sl0 + (sl1 - sl0) * fz).astype(dtype).reshape(c, V, V)


def _march_images(particles: Particles, volumes, camera: Camera,
                  light: Light, cfg: SceneConfig, geom, light_volumes=None):
    """March every particle's slope grid.  Returns the factored
    accumulator planes [N, 1|2, RP, RP] — (P2,) unlit or (P1, P2) lit,
    with T = 1 - P2 recovered after the fan warp — in fp32 or bf16 per
    cfg.render.warp_fp32.  The march runs on the RM x RM grid
    (march_rect; == RP unless warp_march_rect is set) and the planes
    come back at MARCH resolution: (q,) — the LINEAR telescoped optical
    depth — unlit, (P1, P2) lit.  The fan warp, the hat-upsample to RP,
    the unlit exp, the RGB expansion, and the shift-clamp stat are all
    handled by _warp_images."""
    r = cfg.render
    RP = r.warp_rect
    RM = march_rect(cfg)
    V = volumes.shape[-1]
    M = volumes.shape[0]
    S = r.steps
    N = particles.age.shape[0]
    proj = cfg.camera.projection
    wdt = jnp.float32 if r.warp_fp32 else jnp.bfloat16
    # fp32 mode must request true-f32 MXU passes: the TPU default matmul
    # precision is a bf16 multi-pass approximation (measured 1.4e-3
    # device-vs-oracle drift; HIGHEST brings it to 8e-5)
    prec = jax.lax.Precision.HIGHEST if r.warp_fp32 else None
    gsc = jnp.float32(V - 1)
    coeffs = _plane_pos_coeffs(camera, proj)
    lit = light_volumes is not None
    center = lit and r.light_mode == "center"
    MID = S // 2
    rows2d = volumes.reshape(M * V, V * V) if M > ONEHOT_MAX_BANK else None
    lrows2d = (light_volumes.reshape(M * V, V * V)
               if lit and M > ONEHOT_MAX_BANK else None)

    def chunk_fn(args):
        (pos, half, albedo, vol_rows, rx_u, ry_w, szn, scale, valid) = args
        c = pos.shape[0]
        lo = pos - half[:, None]
        ext = 2.0 * half                                  # [c]
        lo_x, lo_y, lo_z = lo[:, 0], lo[:, 1], lo[:, 2]

        # --- per-cell geometry (once per particle, not per step) -------
        rx2 = rx_u[:, None, :]                            # [c,1,RP] (lanes=u)
        ry2 = ry_w[:, :, None]                            # [c,RP,1] (subl=w)
        if proj == "persp":
            rnorm = jnp.sqrt(rx2 * rx2 + ry2 * ry2 + 1.0)  # [c,RP,RP]
            inv_n = 1.0 / rnorm
            d_x = rx2 * inv_n * szn[:, None, None]
            d_y = ry2 * inv_n * szn[:, None, None]
            d_z = inv_n * szn[:, None, None]
            o_x = jnp.float32(camera.eye[0])
            o_y = jnp.float32(camera.eye[1])
            o_z = jnp.broadcast_to(jnp.float32(camera.eye[2]), d_z.shape)
            dt_raw = (ext / S)[:, None, None] * rnorm
        else:
            fz = camera.fwd[2]
            fzs = jnp.where(jnp.abs(fz) < _EPS,
                            jnp.where(fz >= 0, _EPS, -_EPS), fz)
            kx, ky = camera.fwd[0] / fzs, camera.fwd[1] / fzs
            # rx/ry are z=0 intercepts; the ray ORIGIN sits at the camera
            # plane z = eye_z so that t > 0 means "in front of the camera"
            # exactly as in the exact/slab engines.
            ez = jnp.float32(camera.eye[2])
            o_x = jnp.broadcast_to(rx2 + ez * kx, (c, RM, RM))
            o_y = jnp.broadcast_to(ry2 + ez * ky, (c, RM, RM))
            o_z = jnp.full((c, RM, RM), ez, jnp.float32)
            d_x = jnp.broadcast_to(jnp.float32(camera.fwd[0]),
                                   (c, RM, RM))
            d_y = jnp.broadcast_to(jnp.float32(camera.fwd[1]),
                                   (c, RM, RM))
            d_z = jnp.broadcast_to(jnp.float32(camera.fwd[2]),
                                   (c, RM, RM))
            dt_raw = jnp.broadcast_to((ext / S)[:, None, None]
                                      / jnp.abs(fzs), (c, RM, RM))

        def axis_seg(o, d, lo1, hi1):
            sign = jnp.where(d >= 0, 1.0, -1.0)
            ds = jnp.where(jnp.abs(d) < 1e-12, sign * 1e-12, d)
            inv = 1.0 / ds
            ta = (lo1 - o) * inv
            tb = (hi1 - o) * inv
            return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

        hi = pos + half[:, None]
        l3 = lo[:, None, None, :]
        h3 = hi[:, None, None, :]
        t0x, t1x = axis_seg(o_x, d_x, l3[..., 0], h3[..., 0])
        t0y, t1y = axis_seg(o_y, d_y, l3[..., 1], h3[..., 1])
        t0z, t1z = axis_seg(o_z, d_z, l3[..., 2], h3[..., 2])
        t0 = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
        t1 = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
        seg = jnp.maximum(t1 - t0, 0.0)
        dt = jnp.minimum(dt_raw, seg)                     # [c,RP,RP]
        szn3 = szn[:, None, None]

        sc3 = scale[:, None, None]
        pv3 = valid[:, None, None]

        def step(s, carry):
            # factored accumulators (mirrors the Pallas kernel): the
            # per-step color is linear in (atten, 1), so only scalar
            # weight planes accumulate — P1 = sum T*alpha*atten, P2 =
            # sum T*alpha (and their back-to-front twins); the RGB
            # expansion happens once in _warp_images AFTER the fan warp
            # (fewer planes to shift, no [c,3,RP,RP] channel tensors in
            # the loop).
            if lit and not center:
                P1f, P1b, P2b, T = carry
            elif center:
                od, tau_c = carry
            else:
                od = carry
            zeta = (s.astype(jnp.float32) + 0.5) / S
            gz = zeta * gsc
            z0 = jnp.clip(jnp.floor(gz), 0, V - 2).astype(jnp.int32)
            fz_ = jnp.clip(gz - z0.astype(jnp.float32), 0.0, 1.0)
            zw = lo_z + zeta * ext                        # [c]
            c0x, c1x, c0y, c1y = coeffs(zw)
            # hoisted association (mirrors kernel.py and the oracle):
            # gx = (c0x - lo_x)*k2 + (c1x*k2)*rx, k2 = gsc/ext
            k2 = gsc / ext
            gx_u = ((c0x - lo_x) * k2)[:, None] \
                + (c1x * k2)[:, None] * rx_u              # [c,RP]
            gy_w = ((c0y - lo_y) * k2)[:, None] \
                + (c1y * k2)[:, None] * ry_w
            inx = (gx_u >= 0) & (gx_u <= gsc)
            iny = (gy_w >= 0) & (gy_w <= gsc)
            tpos = (zw[:, None, None] - o_z) * szn3 > 0
            inb = iny[:, :, None] & inx[:, None, :] & tpos & pv3

            Wx = _hat(jnp.clip(gx_u, 0, gsc), V, wdt)     # [c,RP,V(a)]
            Wy = _hat(jnp.clip(gy_w, 0, gsc), V, wdt)     # [c,RP,V(b)]

            slab = _fetch_slabs(volumes, rows2d, vol_rows, z0, fz_,
                                M, V, wdt)                # [V,V]|[c,V,V]
            if lit:
                lslab = _fetch_slabs(light_volumes, lrows2d, vol_rows,
                                     z0, fz_, M, V, wdt)
                if slab.ndim == 2:
                    sl2 = jnp.stack([slab, lslab])        # [2,V,V]
                    t1_ = jnp.einsum("nwb,kab->nkwa", Wy, sl2,
                                     preferred_element_type=jnp.float32,
                                     precision=prec)
                else:
                    sl2 = jnp.stack([slab, lslab], axis=1)  # [c,2,V,V]
                    t1_ = jnp.einsum("nwb,nkab->nkwa", Wy, sl2,
                                     preferred_element_type=jnp.float32,
                                     precision=prec)
                both = jnp.einsum("nkwa,nua->nkwu", t1_.astype(wdt), Wx,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
                sig, tau = both[:, 0], both[:, 1]
            else:
                eq1 = "nwb,ab->nwa" if slab.ndim == 2 else "nwb,nab->nwa"
                t1_ = jnp.einsum(eq1, Wy, slab,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
                sig = jnp.einsum("nwa,nua->nwu", t1_.astype(wdt), Wx,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
                tau = None

            if center:
                # telescoped march + ONE light sample kept at the mid
                # step (the per-step tau is computed then discarded off
                # MID — this is the reference path, clarity over speed)
                od_ = od + jnp.where(inb, sig, 0.0)
                tau_c_ = jnp.where(s == MID,
                                   jnp.where(inb, tau, 0.0), tau_c)
                return od_, tau_c_
            if tau is not None:
                alpha = jnp.where(inb, 1.0 - jnp.exp(-sig * sc3 * dt),
                                  0.0)
                fa = T * alpha
                atten = jnp.exp(-sc3 * ext[:, None, None]
                                * jnp.maximum(tau, 0.0))     # [c,RP,RP]
                P1f_ = P1f + fa * atten
                P1b_ = alpha * atten + (1.0 - alpha) * P1b
                P2b_ = alpha + (1.0 - alpha) * P2b
                # P2f telescopes: sum_s T_s*alpha_s = 1 - T_final
                # (mirrors the kernel's (P1, T) accumulators, round 5)
                return P1f_, P1b_, P2b_, T - fa
            # unlit: the OVER recurrence TELESCOPES (atten == 1, binary
            # mask): prod_s (1 - msk*alpha_s) = exp(-sc*dt * sum msk*sig)
            # exactly, so the march accumulates ONE optical-depth plane
            # and the exp runs once after the loop (mirrors the kernel).
            return od + jnp.where(inb, sig, 0.0)

        Z0 = jnp.zeros((c, RM, RM), jnp.float32)
        T0 = jnp.ones((c, RM, RM), jnp.float32)
        fwd3 = (szn >= 0)[:, None, None]
        # T is no plane of the output: T = 1 - P2 exactly (the OVER
        # weights telescope), so the fan warp only ships the P planes.
        # Unlit ships the LINEAR optical depth q = od * scale*dt — the
        # fan + upsample chain in _warp_images stays linear and applies
        # ONE exp at the very end (mirrors the kernel epilogue).
        if lit and not center:
            P1f, P1b, P2b, T = jax.lax.fori_loop(
                0, S, step, (Z0, Z0, Z0, T0))
            planes = jnp.stack([jnp.where(fwd3, P1f, P1b),
                                jnp.where(fwd3, 1.0 - T, P2b)], axis=1)
        elif center:
            od, tau_c = jax.lax.fori_loop(0, S, step, (Z0, Z0))
            planes = jnp.stack(
                [od * sc3 * dt,
                 (sc3 * ext[:, None, None]) * jnp.maximum(tau_c, 0.0)],
                axis=1)
        else:
            od = jax.lax.fori_loop(0, S, step, Z0)
            planes = (od * sc3 * dt)[:, None]
        # invalid particles contribute the OVER identity (P = 0 -> T = 1)
        planes = jnp.where(valid[:, None, None, None], planes,
                           jnp.zeros_like(planes))
        return planes.astype(wdt)

    chunk = max(min(cfg.render.warp_chunk, N), 1)
    while N % chunk:
        chunk -= 1
    nc = N // chunk
    args = (particles.pos.astype(jnp.float32),
            particles.size.astype(jnp.float32),
            particles.albedo.astype(jnp.float32), particles.vol_idx,
            geom["rx_u"], geom["ry_w"], geom["szn"], geom["scale"],
            geom["valid"])

    def reshape(x):
        return x.reshape((nc, chunk) + x.shape[1:])

    if nc > 1:
        imgs = jax.lax.map(chunk_fn, tuple(reshape(a) for a in args))
        return imgs.reshape((N,) + imgs.shape[2:])
    return chunk_fn(args)


def _shift_interp(img, delta, K, axis):
    """out = sum_d w_d * img[shifted by d] over static shifts d in
    [-K, K], with the COMBINED weight w_d = (d0==d)(1-f) + (d0==d-1) f
    (d0 = floor(delta)) — one slice + one fma per plane per shift, the
    weight shared across planes (mirrors the Pallas kernel epilogue).
    ``axis`` is the image axis being shifted (2 = rows/w, 3 = cols/u for
    [c, P, R, R]).  delta: [c, RP(w), RP(u)] fp32, already edge-clamped
    so index + delta stays inside [0, RP-1) — the zero padding below is
    never actually sampled.  Math in fp32 regardless of image dtype."""
    d0 = jnp.floor(delta)
    fr = delta - d0                                       # [c,RP,RP]
    pads = [(0, 0), (0, 0), (0, 0), (0, 0)]
    pads[axis] = (K, K)
    pad = jnp.pad(img.astype(jnp.float32), pads)
    RP = img.shape[axis]
    out = jnp.zeros(img.shape, jnp.float32)
    m_prev = jnp.zeros_like(d0)
    for d in range(-K, K + 1):
        m = ((d0 == d).astype(jnp.float32) if d <= K - 1
             else jnp.zeros_like(d0))
        w = (m + fr * (m_prev - m))[:, None]              # [c,1,RP,RP]
        idx = [slice(None)] * 4
        idx[axis] = slice(K + d, K + d + RP)
        out = out + w * pad[tuple(idx)]
        m_prev = m
    return out


def _safe_div(num, den):
    sgn = jnp.where(den >= 0, 1.0, -1.0)
    return num / (sgn * jnp.maximum(jnp.abs(den), 1e-12))


def fan_shifts(camera: Camera, cfg: SceneConfig, sx0, sy0, px_c, py_c):
    """The fan shifts du (and dw for yawed/rolled cameras) in CLOSED,
    cancellation-free form.

    Definition: du(i, j) = (rx(px_i, py_j) - rx(px_i, py_c)) / (rx(px_{i+1},
    py_c) - rx(px_i, py_c)).  Evaluating that literally subtracts two O(1)
    ray coordinates that agree to ~1e-4 and divides by a same-sized
    spacing — a ~3000x amplifier of fp32 ulp differences between
    backends (measured: broad 1e-4..1e-3 device-vs-oracle drift).  The
    subtractions collapse symbolically: with affine N_x(ox, oy) and
    D(ox, oy) (rx = N_x / D),

        rx_p - rx_u = doy * (up_x * D_ic - Nx_ic * up_z) / (D_ij * D_ic)
        spacing_i   = dox * (right_x * D_ic - Nx_ic * right_z)
                      / (D_{i+1,c} * D_ic)

    so du = doy * Fy_i * D_{i+1,c} / (D_ij * dox * Gx_i) with every factor
    well-conditioned.  The kernel epilogue and the oracle mirror this
    formula exactly.  Orthographic rx is affine, so du/dw are one-liners.

    With warp_march_rect the shifts are evaluated at the RM march-grid
    positions and expressed in MARCH CELLS (march column m sits at rect
    offset m*ratio pixels; spacing ratio pixels) — the fan then runs on
    the coarse grid BEFORE the upsample.

    Shapes: inputs [c]; returns (du [c,RM,RM], dw [c,RM,RM] or None).
    """
    r = cfg.render
    RP = r.warp_rect
    RM = march_rect(cfg)
    ratio = jnp.float32((RP - 1) / max(RM - 1, 1))
    W, H = float(r.width), float(r.height)
    proj = cfg.camera.projection
    row_fan = needs_row_fan(cfg)
    rx_, ry_, rz_ = camera.right[0], camera.right[1], camera.right[2]
    ux, uy, uz = camera.up[0], camera.up[1], camera.up[2]
    fx, fy, fz = camera.fwd[0], camera.fwd[1], camera.fwd[2]
    sx, sy = camera.scale_x, camera.scale_y
    dox = 2.0 * sx / W * ratio              # ox step per march column
    doy_step = -2.0 * sy / H * ratio        # oy step per march row

    iv = jnp.arange(RM, dtype=jnp.float32) * ratio
    ndx_i = (sx0[:, None].astype(jnp.float32) + iv + 0.5) * (2.0 / W) - 1.0
    ox_i = ndx_i * sx                                       # [c,RP]
    ndy_j = 1.0 - (sy0[:, None].astype(jnp.float32) + iv + 0.5) * (2.0 / H)
    oy_j = ndy_j * sy                                       # [c,RP]
    # offsets from the CONTINUOUS center row/column (no cancellation:
    # py_c - sy0 is O(RP))
    doy_j = (py_c[:, None] - (sy0[:, None].astype(jnp.float32)
                              + iv + 0.5)) * (2.0 * sy / H)  # [c,RP]
    dox_i = ((sx0[:, None].astype(jnp.float32) + iv + 0.5)
             - px_c[:, None]) * (2.0 * sx / W)               # [c,RP]

    if proj == "ortho":
        fzs = jnp.where(jnp.abs(fz) < _EPS,
                        jnp.where(fz >= 0, _EPS, -_EPS), fz)
        kx, ky = fx / fzs, fy / fzs
        Ax = rx_ - rz_ * kx
        Bx = ux - uz * kx
        du = jnp.broadcast_to(
            _safe_div(doy_j * Bx, dox * Ax)[:, :, None],
            doy_j.shape[:1] + (RM, RM))
        if not row_fan:
            return du, None
        Ay = ry_ - rz_ * ky
        By = uy - uz * ky
        dw = jnp.broadcast_to(
            _safe_div(dox_i * Ay, doy_step * By)[:, None, :],
            doy_j.shape[:1] + (RM, RM))
        return du, dw

    ndy_c = 1.0 - py_c * (2.0 / H)
    oy_c = (ndy_c * sy)[:, None]                            # [c,1]
    D_ic = fz + ox_i * rz_ + oy_c * uz                      # [c,RP(i)]
    Nx_ic = fx + ox_i * rx_ + oy_c * ux
    Fy_i = ux * D_ic - Nx_ic * uz
    Gx_i = rx_ * D_ic - Nx_ic * rz_
    D_ip1 = D_ic + dox * rz_
    D_ij = D_ic[:, None, :] + (doy_j * uz)[:, :, None]      # [c,RP(j),RP(i)]
    # per-column rational factor hoisted to 1-D (mirrors the kernel
    # epilogue: only D_ij genuinely varies in 2-D)
    A_i = _safe_div(Fy_i * D_ip1, dox * Gx_i)               # [c,RP(i)]
    du = _safe_div(doy_j[:, :, None] * A_i[:, None, :], D_ij)

    if not row_fan:
        return du, None
    ndx_c = px_c * (2.0 / W) - 1.0
    ox_c = (ndx_c * sx)[:, None]
    D_cj = fz + oy_j * uz + ox_c * rz_                      # [c,RP(j)]
    Ny_cj = fy + oy_j * uy + ox_c * ry_
    Fx_j = ry_ * D_cj - Ny_cj * rz_
    Gy_j = uy * D_cj - Ny_cj * uz
    D_jp1 = D_cj + doy_step * uz
    B_j = _safe_div(Fx_j * D_jp1, doy_step * Gy_j)          # [c,RP(j)]
    dw = _safe_div(dox_i[:, None, :] * B_j[:, :, None], D_ij)
    return du, dw


def _edge_clamped_shift(raw, K, RP, axis_idx):
    """Clamp the fan shift to [-K, K-1e-3] and so that index + shift stays
    in [0, RP-1); returns (clamped shift, clamp count contribution mask).
    ``axis_idx``: broadcastable index vector along the shifted axis."""
    clamped = (raw < -K) | (raw > K - 1e-3)
    du = jnp.clip(raw, -K, K - 1e-3)
    du = jnp.maximum(du, -axis_idx)
    du = jnp.minimum(du, (RP - 1.0 - 1e-3) - axis_idx)
    return du, clamped


def _warp_images(images, particles, camera: Camera, light: Light,
                 cfg: SceneConfig, geom):
    """Fan correction + upsample + RGB expansion: resample each
    particle's accumulated planes ([N, 1|2, RM, RM] from _march_images;
    unlit = the LINEAR optical depth) from grid columns to true pixel
    rays (and rows, for yawed cameras) AT MARCH RESOLUTION in
    march-cell units, hat-upsample to the rect, apply the single unlit
    exp, then expand to the premultiplied RGBA image (the expansion is
    linear in the planes, so it commutes with the warp — and 1-2 planes
    shift cheaper than 4 channels).  Returns (images [N, 4, RP, RP],
    shift_clamped count)."""
    r = cfg.render
    RP = r.warp_rect
    RM = march_rect(cfg)
    ratio = (RP - 1) / max(RM - 1, 1)
    K = r.warp_shift_max
    # the fan runs at MARCH resolution in march-cell units: the K-pixel
    # clamp is Kc = K/ratio cells, Km = ceil(Kc) static shift taps
    Kc = K / ratio
    Km = K if RM == RP else -int(-Kc // 1)
    W, H = r.width, r.height
    proj = cfg.camera.projection
    N = images.shape[0]
    center = images.shape[1] == 2 and r.light_mode == "center"
    lit = images.shape[1] == 2 and not center
    row_fan = needs_row_fan(cfg)
    wdt = jnp.float32 if r.warp_fp32 else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if r.warp_fp32 else None
    l_col = jnp.asarray(light.color, jnp.float32)[None, :, None, None]
    l_amb = jnp.asarray(light.ambient, jnp.float32)[None, :, None, None]
    if RM != RP:
        Uy_np, Ux_np = upsample_weights(RP, RM)
        Uyj = jnp.asarray(Uy_np).astype(wdt)
        Uxj = jnp.asarray(Ux_np).astype(wdt)

    def chunk_fn(args):
        img, albedo, sx0, sy0, px_c, py_c, rx_u, ry_w, valid = args
        du_raw, dw_raw = fan_shifts(camera, cfg, sx0, sy0, px_c, py_c)

        iif = jnp.arange(RM, dtype=jnp.float32)
        du, clampx = _edge_clamped_shift(du_raw, Kc, RM,
                                         iif[None, None, :])
        clamp_total = jnp.sum((valid[:, None, None] & clampx)
                              .astype(jnp.int32))

        def fan(im, delta, axis):
            # center mode: the smooth attenuation plane (plane 1, tau')
            # SKIPS the fan — the ±K px correction is visually nil on
            # it (PSNR-gated vs per-step light; kernel + oracle mirror
            # the bypass), halving the fan cost of the lit presets
            if center:
                return jnp.concatenate(
                    [_shift_interp(im[:, :1], delta, Km, axis=axis),
                     im[:, 1:]], axis=1)
            return _shift_interp(im, delta, Km, axis=axis)

        out = fan(img, du, axis=3)

        if dw_raw is not None:
            dw, clampy = _edge_clamped_shift(dw_raw, Kc, RM,
                                             iif[None, :, None])
            clamp_total = clamp_total + jnp.sum(
                (valid[:, None, None] & clampy).astype(jnp.int32))
            out = fan(out, dw, axis=2)

        # The unlit/center exps run AT MARCH RESOLUTION, before the
        # upsample (the upsampled quantity is the saturated P1/P2, the
        # classic reduced-resolution-impostor choice; mirrors the
        # kernel epilogue and the oracle).  Unlit keeps ONE plane
        # (P1 aliases P2 after the upsample).
        if lit:
            pl_m = out                                    # (P1, P2)
        elif center:
            P2m = 1.0 - jnp.exp(-out[:, 0])
            P1m = jnp.exp(-out[:, 1]) * P2m  # per-ray mid-depth atten
            pl_m = jnp.stack([P1m, P2m], axis=1)
        else:
            pl_m = (1.0 - jnp.exp(-out[:, 0]))[:, None]   # (P2,)

        if RM != RP:
            # hat-upsample march grid -> rect (same quantization points
            # as the kernel epilogue: plane -> wdt, f32-accum dots)
            t_ = jnp.einsum("im,cpmk->cpik", Uyj, pl_m.astype(wdt),
                            preferred_element_type=jnp.float32,
                            precision=prec)
            pl_m = jnp.einsum("cpik,kj->cpij", t_.astype(wdt), Uxj,
                              preferred_element_type=jnp.float32,
                              precision=prec)

        # RGB expansion: C_ch = alb_ch * (lcol_ch * P1 + amb_ch * P2);
        # T = 1 - P2 (never shifted: the shift weights sum to 1).
        if lit or center:
            P1, P2 = pl_m[:, 0], pl_m[:, 1]
        else:
            P2 = pl_m[:, 0]
            P1 = P2    # atten == 1
        Tp = 1.0 - P2
        col = albedo[:, :, None, None] * (l_col * P1[:, None]
                                          + l_amb * P2[:, None])
        out4 = jnp.concatenate([col, Tp[:, None]], axis=1)
        return out4, clamp_total

    chunk = max(min(cfg.render.warp_chunk, N), 1)
    while N % chunk:
        chunk -= 1
    nc = N // chunk
    args = (images, particles.albedo.astype(jnp.float32),
            geom["sx0"], geom["sy0"], geom["px_c"], geom["py_c"],
            geom["rx_u"], geom["ry_w"], geom["valid"])

    def reshape(x):
        return x.reshape((nc, chunk) + x.shape[1:])

    if nc > 1:
        out, clamps = jax.lax.map(chunk_fn, tuple(reshape(a) for a in args))
        return out.reshape((N,) + out.shape[2:]), jnp.sum(clamps)
    return chunk_fn(args)


def _pair_swap_order(order, geom, cfg: SceneConfig, y_start, h_local):
    """One vectorized pass of composite-order-legal adjacent swaps that
    removes PAIR-INTERNAL canvas-window overlaps for the paired fused
    kernel (render/kernel.py PAIR): at each odd position k, the pair
    member q = order[k] whose window overlaps its partner p = order[k-1]
    pays a serialized canvas round trip (its deferred fetch must wait
    p's write-back).  Swapping q with the NEXT particle r = order[k+1]
    is EXACT whenever the windows of q and r are DISJOINT — disjoint
    canvas windows touch disjoint pixels, so their OVER order commutes
    bit-for-bit — and profitable when it neither creates a (p, r)
    internal overlap nor a new overlap against s = order[k+2].
    Odd-position swaps touch disjoint index pairs, so the whole pass is
    one gather.  The "don't poison the next pair" guard tests s =
    order[k+2] at its PRE-pass position, and an independent swap firing
    at k+2 moves that element — so one pass can still leave a pair-
    internal overlap it meant to avoid (exactness is unaffected: the
    swapped q/r disjointness check is per-swap).  The pass therefore
    runs TWICE; the second pass sees the updated order and swaps away
    most of that residue.  Measured on c4: pair-internal overlaps
    13.8% -> ~4% after one pass."""
    from volq.render.kernel import canvas_geom
    cg = canvas_geom(cfg, h_local)
    WH, WW = cg.WH, cg.WW
    N = order.shape[0]

    def one_pass(order):
        _, _, oy, ox = _window_corners(geom["sy0"][order],
                                       geom["sx0"][order], cg, y_start)

        def ovl(i, j):
            return ((jnp.abs(oy[i] - oy[j]) < WH)
                    & (jnp.abs(ox[i] - ox[j]) < WW))

        k = jnp.arange(1, N - 1, 2)             # odd positions with k+1
        p, q, rr = k - 1, k, k + 1
        s = jnp.minimum(k + 2, N - 1)
        has_s = (k + 2) <= (N - 1)
        swap = (ovl(q, p)                        # q stalls on p today
                & ~ovl(q, rr)                    # LEGALITY: q, r disjoint
                & ~ovl(rr, p)                    # (p, r) pair stays clean
                & ~(ovl(s, q) & has_s & ~ovl(s, rr)))  # next pair clean
        perm = jnp.arange(N, dtype=jnp.int32)
        perm = perm.at[k].set(jnp.where(swap, rr, k))
        perm = perm.at[rr].set(jnp.where(swap, k, rr))
        return order[perm]

    return one_pass(one_pass(order))


def _hazard_swap_order(order, geom, cfg: SceneConfig, y_start, h_local,
                       n_passes: int):
    """General composite-order hazard reduction for the UNPAIRED fused
    kernel (the paired kernel runs _pair_swap_order instead): every
    adjacent pair of overlapping canvas windows serializes the
    double-buffered protocol (the fetch must wait the predecessor's
    write-back — counted as win_hazard in stats).  A hazard between
    depth-neighbors b, c cannot be swapped away directly (overlapping
    windows do NOT commute), but bubbling a DISJOINT particle between
    them can: swapping positions (j, j+1) is bit-exact iff the two
    windows are disjoint (disjoint windows touch disjoint pixels, so
    their OVER order commutes), and profitable when it lowers the
    local hazard count against both outer neighbors a, d.  Each pass
    runs an even and an odd phase; same-phase swaps touch disjoint
    position pairs, so each phase is one vectorized gather and the
    composition stays exact.  The benefit test reads a and d at their
    pre-phase positions (a simultaneous neighbor swap can stale it) —
    a perf-only approximation, mopped up by later passes."""
    from volq.render.kernel import canvas_geom
    cg = canvas_geom(cfg, h_local)
    WH, WW = cg.WH, cg.WW
    N = order.shape[0]
    if N < 3:
        return order

    def one_phase(order, phase):
        _, _, oy, ox = _window_corners(geom["sy0"][order],
                                       geom["sx0"][order], cg, y_start)

        def ovl(i, j, live=True):
            o = ((jnp.abs(oy[i] - oy[j]) < WH)
                 & (jnp.abs(ox[i] - ox[j]) < WW))
            return o & live

        j = jnp.arange(phase, N - 1, 2)
        a = jnp.maximum(j - 1, 0)
        d = jnp.minimum(j + 2, N - 1)
        has_a, has_d = j >= 1, (j + 2) <= (N - 1)
        before = (ovl(a, j, has_a).astype(jnp.int32)
                  + ovl(j + 1, d, has_d).astype(jnp.int32))
        after = (ovl(a, j + 1, has_a).astype(jnp.int32)
                 + ovl(j, d, has_d).astype(jnp.int32))
        swap = ~ovl(j, j + 1) & (after < before)   # LEGALITY: disjoint
        perm = jnp.arange(N, dtype=jnp.int32)
        perm = perm.at[j].set(jnp.where(swap, j + 1, j))
        perm = perm.at[j + 1].set(jnp.where(swap, j, j + 1))
        return order[perm]

    for _ in range(n_passes):
        order = one_phase(order, 0)
        order = one_phase(order, 1)
    return order


def _window_corners(sy0, sx0, cg, y_start):
    """Per-particle canvas placement positions (ayf/axf, fractional in
    coarse mode) and ALIGNED window corners (oy rows, ox array elems),
    in canvas-array units.  The ONE computation site — the kernel reads
    ayf/axf from its geomf SMEM pack, so host and kernel can never
    disagree on the placement origin."""
    ratio = jnp.float32(cg.ratio)
    ayf = jnp.float32(cg.pad) \
        + (sy0.astype(jnp.float32) - jnp.float32(y_start)) * ratio
    axf = jnp.float32(cg.pad) + sx0.astype(jnp.float32) * ratio
    oy = jnp.clip(jnp.floor(ayf).astype(jnp.int32), 0, cg.Hc - cg.WH)
    oy = (oy // 8) * 8
    oxu = jnp.clip(jnp.floor(axf).astype(jnp.int32), 0,
                   (cg.Wc - cg.WW) // cg.e)
    oxu = (oxu // cg.gx) * cg.gx
    return ayf, axf, oy, oxu * cg.e


def _fused_comp_offsets(geom_o, cfg: SceneConfig, y_start, h_local):
    """Canvas-window offsets + pipeline hazards for the FUSED
    march+composite kernel, computed from DEPTH-ORDERED geometry
    (canvas_geom units: coarse cells / interleaved lanes aware)."""
    from volq.render.kernel import canvas_geom
    cg = canvas_geom(cfg, h_local)
    ayf, axf, oy_al, ox_al = _window_corners(
        geom_o["sy0"], geom_o["sx0"], cg, y_start)
    ov = ((jnp.abs(oy_al - jnp.roll(oy_al, 1)) < cg.WH)
          & (jnp.abs(ox_al - jnp.roll(ox_al, 1)) < cg.WW)) \
        .astype(jnp.int32)
    ov = ov.at[0].set(0)
    # the placement reaches past the window's always-copied A half only
    # for large sub-granule offsets (the kernel's rare synchronous B
    # half); dxu/sup are in x-units, WWA in array elems
    dxu = axf - (ox_al // cg.e).astype(jnp.float32)
    wide = (cg.e * (dxu + cg.sup) > cg.WWA).astype(jnp.int32)
    dyi = (jnp.floor(ayf).astype(jnp.int32) - oy_al)
    dxi = (jnp.floor(axf).astype(jnp.int32) - ox_al // cg.e)
    return dict(oy=oy_al, ox=ox_al, dy=dyi, dx=dxi, ov=ov, wide=wide,
                ayf=ayf, axf=axf, WH=cg.WH, WW=cg.WW, Hc=cg.Hc,
                Wc=cg.Wc, cg=cg)


def _canvas_init(cfg: SceneConfig, h_local):
    """XLA-path padded canvas (C [3,Hc,Wc], T [Hc,Wc]); with
    warp_canvas_fp32=False it is stored bf16 (the Pallas kernel does the
    same; the oracle mirrors the per-particle rounding)."""
    r = cfg.render
    RP = r.warp_rect
    cdt = jnp.float32 if r.warp_canvas_fp32 else jnp.bfloat16
    Hc = h_local + 2 * RP
    Wc = r.width + 2 * RP
    return (jnp.zeros((3, Hc, Wc), cdt), jnp.ones((Hc, Wc), cdt))


def _composite_chunk(canvas, images, geom, cfg: SceneConfig, y_start,
                     h_local):
    """OVER a chunk of ALREADY depth-ordered per-particle windows onto
    the carried canvas."""
    r = cfg.render
    RP = r.warp_rect
    C0, T0 = canvas
    cdt = C0.dtype
    Hc, Wc = T0.shape
    n = images.shape[0]
    oy_all = jnp.clip(geom["sy0"] - jnp.asarray(y_start, jnp.int32) + RP,
                      0, Hc - RP)
    ox_all = jnp.clip(geom["sx0"] + RP, 0, Wc - RP)

    def body(k, carry):
        C, T = carry
        img = jax.lax.dynamic_slice(
            images, (k, 0, 0, 0), (1, 4, RP, RP))[0].astype(jnp.float32)
        y = oy_all[k]
        x = ox_all[k]
        Cw = jax.lax.dynamic_slice(C, (0, y, x),
                                   (3, RP, RP)).astype(jnp.float32)
        Tw = jax.lax.dynamic_slice(T, (y, x), (RP, RP)).astype(jnp.float32)
        Cn = (Cw + Tw[None] * img[:3]).astype(cdt)
        Tn = (Tw * img[3]).astype(cdt)
        C = jax.lax.dynamic_update_slice(C, Cn, (0, y, x))
        T = jax.lax.dynamic_update_slice(T, Tn, (y, x))
        return C, T

    return jax.lax.fori_loop(0, n, body, (C0, T0))


def _coarse_up_weights(P: int, Cn: int, ratio: float):
    """[P, Cn] bilinear cell->pixel weights, built IN-JIT from iotas
    (no multi-MB host constants in the HLO): W[p, c] =
    hat(p * ratio - c).  Mirrored by the oracle with the same f32
    position arithmetic."""
    pos = jnp.arange(P, dtype=jnp.float32)[:, None] * jnp.float32(ratio)
    c = jnp.arange(Cn, dtype=jnp.float32)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - c))


def _canvas_finish(C, T, cfg: SceneConfig, h_local, cropped=False):
    """Crop the padded canvas and compose over the background; in
    coarse mode (warp_coarse) also bilinear-upsample the march-cell
    canvas to pixels (ONE full-frame pass — the per-particle windows,
    placement matmuls and RMW all ran ~(RP/RM)^2 smaller for it).
    ``cropped``: the input is already the image-extent crop (the
    sharded path crops before the binary swap to cut ICI bytes)."""
    r = cfg.render
    if r.engine == "warp" and (r.warp_coarse or r.warp_canvas_scale):
        from volq.render.kernel import canvas_geom
        g = canvas_geom(cfg, h_local)
        p0 = 0 if cropped else g.pad
        C = jax.lax.dynamic_slice(C, (0, p0, p0), (3, g.hc_img, g.wc_img))
        T = jax.lax.dynamic_slice(T, (p0, p0), (g.hc_img, g.wc_img))
        X = jnp.concatenate([C, T[None]], 0).astype(jnp.float32)
        Fy = _coarse_up_weights(h_local, g.hc_img, g.ratio)
        Fx = _coarse_up_weights(r.width, g.wc_img, g.ratio)
        hi = jax.lax.Precision.HIGHEST
        X = jnp.einsum("ph,khw->kpw", Fy, X, precision=hi)
        X = jnp.einsum("kpw,qw->kpq", X, Fx, precision=hi)
        C, T = X[:3], X[3]
    else:
        RP = 0 if cropped else r.warp_rect
        C = C[:, RP:RP + h_local, RP:RP + r.width].astype(jnp.float32)
        T = T[RP:RP + h_local, RP:RP + r.width].astype(jnp.float32)
    bg = jnp.asarray(r.background, jnp.float32)[:, None, None]
    rgb = C + T[None] * bg
    return jnp.concatenate([rgb, (1.0 - T)[None]], axis=0) \
        .transpose(1, 2, 0)                                # [h,W,4]


def render_warp_canvas(particles: Particles, volumes, camera: Camera,
                       light: Light, cfg: SceneConfig, light_volumes=None,
                       y_start=0, h_local: int | None = None,
                       slab_banks=None):
    """March + composite the given particles onto a fresh padded canvas,
    WITHOUT the final crop/background pass.  Returns
    (canvas [4, Hc, Wc] — premultiplied C in [:3], T in [3] — , stats).
    This is the shardable unit of the warp engine's distributed path:
    canvases of disjoint depth slices combine with the associative OVER
    (dist/sharded.py binary-swap compositing).

    Particles are processed in depth-sorted MEGACHUNKS of at most
    ``warp_mega`` (march a chunk -> composite it onto the carried canvas
    -> next chunk), bounding the [chunk, 4, RP, RP] image buffer — 16k
    particles at 4K would otherwise need a multi-GB buffer."""
    r = cfg.render
    if h_local is None:
        h_local = r.height
    if light_volumes is not None and r.light_steps <= 0:
        # no light march requested: drop the bake HERE so every
        # downstream path (fused kernel, XLA march, fan, host-side
        # pairing/residency mirrors, oracle) gates ``lit`` identically —
        # kernel.march_warp_pallas applies the same normalization
        light_volumes = None
    N = particles.age.shape[0]
    particles, volumes, camera, light_volumes = permute_for_march(
        particles, volumes, camera, light_volumes, cfg)
    geom, stats = _grid_geometry(particles, camera, cfg, y_start, h_local)

    # Pre-lerped marching slab banks (see bake_march_slabs): passed in by
    # callers that cache them across frames (static scenes), else baked
    # here in-jit (animated scenes / one-shot renders).
    if (slab_banks is None and r.warp_pallas
            and use_slab_banks(cfg, volumes.shape[-1])):
        wdt = jnp.float32 if r.warp_fp32 else jnp.bfloat16
        lit_ = light_volumes is not None and r.light_steps > 0
        vx_ = slab_vx_eff(cfg, volumes.shape[-1])
        slab_banks = (bake_march_slabs(volumes, r.steps, wdt, vx_),
                      bake_march_slabs(light_volumes, r.steps, wdt, vx_)
                      if lit_ else None)

    # (A two-size-class rect path existed through round 2; it measured
    # SLOWER than the single-class fused path on every preset AND on its
    # own designed-for extreme-size-ratio scene — 10.1 vs 4.6 ms on a
    # 10x-size-spread c3 variant, round 3 — and was deleted.)

    lit_ = light_volumes is not None and r.light_steps > 0
    center_ = lit_ and r.light_mode == "center"
    pair_on = False
    if r.warp_pair:
        # zero-silent-anything: warp_pair=1 outside the pairing envelope
        # (unfused, streamed banks, per-step lit, odd N, march_rect > 96)
        # must not silently run unpaired — warn at trace time and count
        # it in the frame stats.
        from volq.render.kernel import (pair_enabled, stack_bank_resident,
                                        canvas_nbytes)
        res_bytes = (canvas_nbytes(cfg, h_local)
                     if (r.warp_canvas_vmem and r.warp_pallas
                         and r.warp_fused) else 0)
        pair_on = (r.warp_pallas and r.warp_fused and pair_enabled(
            cfg, N, slab_banks is not None, lit_, center_,
            resident=stack_bank_resident(slab_banks, lit_, center=center_,
                                         reserve_bytes=res_bytes)))
        stats = dict(stats, pair_inactive=jnp.int32(0 if pair_on else 1))
        if not pair_on:
            import warnings
            warnings.warn(
                "warp_pair=1 requested but pairing is outside its "
                "envelope for this scene (requires the fused Pallas "
                "kernel, slab banks — VMEM-resident or streamed for "
                "canvas_vmem/per-step-lit configs — an even particle "
                "count, and march_rect <= 96) — rendering unpaired",
                stacklevel=2)

    z = jnp.where(geom["valid"], geom["vz"], jnp.inf)
    order = jnp.argsort(z, stable=True).astype(jnp.int32)
    C = N
    if r.warp_mega > 0:
        C = min(r.warp_mega, N)
        while N % C:
            C -= 1
    n_mega = N // C

    if r.warp_pallas:
        from volq.render.kernel import (march_warp_pallas, canvas_init_pallas,
                                        composite_chunk_pallas,
                                        stack_bank_resident)
        canvas = canvas_init_pallas(cfg, h_local, fused=r.warp_fused)
        # Shared-volume banks streamed per particle (too big for the
        # VMEM-resident mode): march in VOL-IDX-SORTED order so runs of
        # equal vol_idx share ONE slab-stack DMA (the kernel's block
        # index map refetches only on change) — the composite still runs
        # in depth order via its ``order`` prefetch.
        march_vol_sort = (slab_banks is not None
                          and not stack_bank_resident(
                              slab_banks, lit_,
                              center=lit_ and r.light_mode == "center")
                          and volumes.shape[0] < N)
    else:
        canvas = _canvas_init(cfg, h_local)
        march_vol_sort = False

    if r.warp_pallas and r.warp_fused:
        # FUSED march+composite: one kernel over the whole depth-ordered
        # particle list — no [N, 4, RP, RP] image round-trip, no separate
        # composite dispatch, no megachunking (the canvas RMW streams).
        # Inputs are gathered into depth order host-side (small arrays);
        # vol-idx sorting doesn't apply (the composite fixes the order),
        # so shared streamed banks rely on DMA/compute overlap instead.
        if pair_on:
            # pair-aware composite reorder: bit-exact (only disjoint
            # windows commute), cuts the paired kernel's deferred-fetch
            # stalls; flags below are recomputed on the swapped order
            order = _pair_swap_order(order, geom, cfg, y_start, h_local)
        elif r.warp_hazard_passes > 0:
            # general adjacent-hazard reduction (same exactness rule)
            order = _hazard_swap_order(order, geom, cfg, y_start,
                                       h_local, r.warp_hazard_passes)
        parts_o = jax.tree.map(lambda a: a[order], particles)
        geom_o = {k: v[order] for k, v in geom.items()}
        comp = _fused_comp_offsets(geom_o, cfg, y_start, h_local)
        # pipeline observability: adjacent-window overlaps serialize the
        # double-buffered canvas protocol (win_hazard); the odd-position
        # subset are pair-internal overlaps, whose member defers its
        # fetch to the epilogue in paired mode (pair_defer)
        stats = dict(stats, win_hazard=jnp.sum(comp["ov"]))
        if pair_on:
            stats["pair_defer"] = jnp.sum(comp["ov"][1::2])
        canvas, sc = march_warp_pallas(
            parts_o, volumes, camera, light, cfg, geom_o,
            light_volumes=light_volumes, slab_banks=slab_banks,
            canvas=canvas, comp=comp)
        if comp["cg"].ilv:
            # de-interleave ONCE per frame ([Hc, 4*Wc] lanes ->
            # [4, Hc, Wc] planes) so every downstream consumer (finish,
            # binary swap, tests) sees the standard canvas layout; the
            # whole-canvas transpose is ~2 orders of magnitude less
            # traffic than the per-particle window DMAs it buys back
            g = comp["cg"]
            canvas = canvas.reshape(g.Hc, g.Wc // 4, 4) \
                .transpose(2, 0, 1)
        return canvas, dict(stats, shift_clamped=sc)

    shift_clamped = jnp.int32(0)
    for m in range(n_mega):
        comp_order = None
        if n_mega == 1 and r.warp_pallas and not march_vol_sort:
            parts_m, geom_m = particles, geom
            comp_order = order
        else:
            ids = order if n_mega == 1 else \
                jax.lax.dynamic_slice(order, (m * C,), (C,))
            if march_vol_sort:
                vk = jnp.where(geom["valid"][ids],
                               particles.vol_idx[ids], -1)
                msort = jnp.argsort(vk, stable=True).astype(jnp.int32)
                ids = ids[msort]
                comp_order = jnp.argsort(msort).astype(jnp.int32)
            parts_m = jax.tree.map(lambda a: a[ids], particles)
            geom_m = {k: v[ids] for k, v in geom.items()}
        if r.warp_pallas:
            images, sc = march_warp_pallas(
                parts_m, volumes, camera, light, cfg, geom_m,
                light_volumes=light_volumes, slab_banks=slab_banks)
            canvas = composite_chunk_pallas(
                canvas, images, geom_m, cfg, y_start, h_local,
                order=comp_order)
        else:
            images = _march_images(parts_m, volumes, camera, light,
                                   cfg, geom_m,
                                   light_volumes=light_volumes)
            images, sc = _warp_images(images, parts_m, camera, light,
                                      cfg, geom_m)
            canvas = _composite_chunk(canvas, images, geom_m, cfg,
                                      y_start, h_local)
        shift_clamped = shift_clamped + sc

    if not r.warp_pallas:
        canvas = jnp.concatenate([canvas[0], canvas[1][None]], axis=0)
    stats = dict(stats, shift_clamped=shift_clamped)
    return canvas, stats


def _merge_band_stats(a, b):
    """Counters sum across bands (a straddling particle renders in each
    band it touches, so 'rendered' counts render SLOTS, honestly > N);
    scene-global stats (alive, pair_inactive) are identical per band."""
    keep = ("alive", "pair_inactive")
    return {k: (v if k in keep else v + b[k]) for k, v in a.items()}


def render_warp(particles: Particles, volumes, camera: Camera, light: Light,
                cfg: SceneConfig, light_volumes=None, y_start=0,
                h_local: int | None = None, slab_banks=None):
    """Render one frame (or a horizontal pixel band) with the warp
    engine.  Returns ([h_local, W, 4] f32, stats).

    warp_bands > 1 renders the frame as that many horizontal pixel
    bands, one fused-kernel dispatch each: disjoint pixel sets make the
    result EXACTLY the unbanded image (per-band compositing is the same
    per-pixel math), while each band's canvas is ~1/bands the size — the
    enabler for a pixel-resolution warp_canvas_vmem canvas.  Particles
    straddling a band boundary march once per band they touch
    (_grid_geometry's on_screen test already culls per band)."""
    r = cfg.render
    if h_local is None:
        h_local = r.height
    if light_volumes is not None and r.light_steps <= 0:
        light_volumes = None       # see render_warp_canvas: unlit means unlit
    bands = int(r.warp_bands)
    if bands > 1 and y_start == 0 and h_local == r.height:
        if (slab_banks is None and r.warp_pallas
                and use_slab_banks(cfg, volumes.shape[-1])):
            # bake the pre-lerped slab banks ONCE for all bands
            wdt = jnp.float32 if r.warp_fp32 else jnp.bfloat16
            lit_ = light_volumes is not None and r.light_steps > 0
            vx_ = slab_vx_eff(cfg, volumes.shape[-1])
            slab_banks = (
                bake_march_slabs(volumes, r.steps, wdt, vx_),
                bake_march_slabs(light_volumes, r.steps, wdt, vx_)
                if lit_ else None)
        rows, stats, y0 = [], None, 0
        for i in range(bands):
            bh = r.height // bands + (1 if i < r.height % bands else 0)
            img, st = render_warp(particles, volumes, camera, light, cfg,
                                  light_volumes=light_volumes, y_start=y0,
                                  h_local=bh, slab_banks=slab_banks)
            rows.append(img)
            stats = st if stats is None else _merge_band_stats(stats, st)
            y0 += bh
        return jnp.concatenate(rows, axis=0), stats
    canvas, stats = render_warp_canvas(particles, volumes, camera, light,
                                       cfg, light_volumes=light_volumes,
                                       y_start=y_start, h_local=h_local,
                                       slab_banks=slab_banks)
    return _canvas_finish(canvas[:3], canvas[3], cfg, h_local), stats
