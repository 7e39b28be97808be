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
from volq.render.xla_render import composite_pairs, assemble_image, _fade
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


def _march_pairs_slab(pairs: PairList, particles: Particles, volumes,
                      camera: Camera, light: Light, cfg: SceneConfig,
                      tile_start=0, light_volumes=None):
    """March all kept pairs with z-plane quadrature.
    Returns (C [P,tp,3], t [P,tp]) premultiplied color + transmittance."""
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
    scale = (r.density_scale
             * _fade(tau_life, r.fade_in, r.fade_out))[:, None]  # [P,1]

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

    def sample_plane(bank, zeta):
        """Density of every (pair, ray) at local plane z = zeta.
        Returns (value [P,tp] f32, inb [P,tp] bool, pref [P,tp] t-coord)."""
        z0 = jnp.clip(jnp.floor(zeta * gscale), 0, V - 2).astype(jnp.int32)
        fz = jnp.clip(zeta * gscale - z0.astype(jnp.float32), 0.0, 1.0)
        slab = _slab_at(bank, vol_rows, z0, fz, wdt)  # [V,V] or [P,V,V]

        zw = lo_z + zeta * ext                      # [P,1] world z of plane
        ts = (zw - oz) / dz_safe                    # [P,tp]
        gx = (ox + ts * dx - lo_x) / ext * gscale
        gy = (oy + ts * dy - lo_y) / ext * gscale
        inb = ((ts > 0) & (gx >= 0) & (gx <= gscale)
               & (gy >= 0) & (gy <= gscale))
        Wx = _hat_weights(jnp.clip(gx, 0, gscale), V, wdt)   # [P,tp,V]
        Wy = _hat_weights(jnp.clip(gy, 0, gscale), V, wdt)
        eq = "ptj,jk->ptk" if slab.ndim == 2 else "ptj,pjk->ptk"
        t1_ = jnp.einsum(eq, Wx, slab,
                         preferred_element_type=jnp.float32)
        val = jnp.sum(t1_ * Wy.astype(jnp.float32), axis=-1)
        return val, inb, ts

    l_col = jnp.asarray(light.color, jnp.float32)
    l_amb = jnp.asarray(light.ambient, jnp.float32)

    def step(s, carry):
        Cf, Cb, T = carry
        zeta = (s.astype(jnp.float32) + 0.5) / S
        sigma, inb, _ = sample_plane(volumes, zeta)
        sigma = sigma * scale
        alpha = jnp.where(inb & pvalid, 1.0 - jnp.exp(-sigma * dt), 0.0)
        if light_volumes is not None:
            # light_volumes stores unit-scale optical depth tau_raw; depth
            # is linear in extinction scale and world extent, so both are
            # applied here per particle (volume/lightbake.py).
            tau, _, _ = sample_plane(light_volumes, zeta)
            atten = jnp.exp(-scale * ext * jnp.maximum(tau, 0.0))[..., None]
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


def render_slab_tiles(particles: Particles, volumes, camera: Camera,
                      light: Light, cfg: SceneConfig, tile_start=0,
                      n_tiles_local: int | None = None, light_volumes=None):
    """Slab-rendered flat tile range (same contract as render_tiles)."""
    pairs = bin_particles(particles, camera, cfg, tile_start=tile_start,
                          n_tiles_local=n_tiles_local)
    C_pair, t_pair = _march_pairs_slab(pairs, particles, volumes, camera,
                                       light, cfg, tile_start=tile_start,
                                       light_volumes=light_volumes)
    tiles = composite_pairs(pairs, C_pair, t_pair, cfg,
                            n_tiles_local=n_tiles_local)
    return tiles, pairs.stats


def render_slab(particles: Particles, volumes, camera: Camera, light: Light,
                cfg: SceneConfig, light_volumes=None):
    """Render one full frame with the slab engine. ([H,W,4] f32, stats)."""
    tiles, stats = render_slab_tiles(particles, volumes, camera, light, cfg,
                                     light_volumes=light_volumes)
    return assemble_image(tiles, cfg), stats
