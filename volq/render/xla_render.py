"""The device raymarch renderer (SURVEY.md C2 + C7 + C8).

One jitted XLA program per frame:

  1. bin alive particles into depth-ordered (tile, particle) pairs
     (render/binning.py) — replaces the reference's billboard rasterization;
  2. march every kept pair: tile rays vs. the particle AABB, ``steps``
     midpoint samples of the particle's density volume (trilinear via XLA's
     native gather — see core/interp.py for why gather, not MXU one-hots),
     optional secondary light march, front-to-back accumulation *within*
     the pair -> premultiplied (color, transmittance) per pixel;
  3. composite pairs per tile in depth order with the associative OVER
     operator, then stitch tiles into the [H, W, 4] frame.

Semantics are defined by the oracle (oracle/raymarch_cpu.py); every frame
must match it to 1e-3 per pixel (BASELINE.json:5).  All shapes are static;
there is no data-dependent control flow — misses are predicated to zero
alpha, exactly like the oracle's masked math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volq.core.aabb import ray_aabb
from volq.core.camera import pixel_rays
from volq.core.interp import sample_bank_trilinear
from volq.core.types import Camera, Light, Particles
from volq.render.binning import bin_particles, PairList
from volq.scene.config import SceneConfig


def _fade(tau, fade_in, fade_out):
    fi = max(float(fade_in), 1e-6)
    fo = max(float(fade_out), 1e-6)
    return jnp.clip(jnp.minimum(tau / fi, (1.0 - tau) / fo), 0.0, 1.0)


def _near_fade(view_z, r):
    """Camera-proximity fade (the reference-class 'camera near fade'):
    opacity ramps 0 -> 1 between view depths near_fade_end and
    near_fade_start; disabled when near_fade_start <= 0."""
    if r.near_fade_start <= 0.0:
        return 1.0
    span = max(r.near_fade_start - r.near_fade_end, 1e-6)
    return jnp.clip((view_z - r.near_fade_end) / span, 0.0, 1.0)


def _march_pairs(pairs: PairList, particles: Particles, bank2d,
                 vol_size: int, camera: Camera, light: Light,
                 cfg: SceneConfig, tile_start=0):
    """March all kept pairs. Returns (C [P,tp,3], t [P,tp]) premultiplied
    color and transmittance of each pair, fp32."""
    r = cfg.render
    tiles_x = r.width // r.tile_w
    tp = r.tile_h * r.tile_w
    V = vol_size
    gtile = pairs.tile + jnp.asarray(tile_start, jnp.int32)

    pid = pairs.pid
    pos = particles.pos[pid]                       # [P,3]
    half = particles.size[pid][:, None]            # [P,1]
    albedo = particles.albedo[pid]                 # [P,3]
    vol = particles.vol_idx[pid]                   # [P] bank row
    tau_life = particles.age[pid] / jnp.maximum(particles.lifetime[pid], 1e-6)
    zview = (pos - camera.eye) @ camera.fwd
    scale = (r.density_scale * _fade(tau_life, r.fade_in, r.fade_out)
             * _near_fade(zview, r))[:, None]  # [P,1]

    # Tile pixel rays: [P, tp]. Invalid/padded pairs clamp into range.
    ti = jnp.arange(tp, dtype=jnp.int32)
    px = (gtile % tiles_x)[:, None] * r.tile_w + (ti % r.tile_w)[None, :]
    py = jnp.minimum(gtile // tiles_x, r.height // r.tile_h - 1)[
        :, None] * r.tile_h + (ti // r.tile_w)[None, :]
    o, d = pixel_rays(camera, px, py, r.width, r.height,
                      cfg.camera.projection)        # [P,tp,3]

    lo = (pos[:, None, :] - half[..., None])        # [P,1,3]
    hi = (pos[:, None, :] + half[..., None])
    t0, t1 = ray_aabb(o, d, lo, hi)                 # [P,tp]
    seg = t1 - t0
    covered = (seg > 0) & pairs.valid[:, None]
    dt = jnp.where(covered, seg / r.steps, 0.0)

    l_dir = light.direction

    def density_at(p):
        """p: [P,tp,3] world -> sigma [P,tp] (already fade/scale applied)."""
        u = (p - lo) / (2.0 * half[..., None])
        return sample_bank_trilinear(bank2d, V, vol[:, None], u) * scale

    def light_atten(p):
        if r.light_steps <= 0:
            return 1.0
        lt0, lt1 = ray_aabb(p, jnp.broadcast_to(l_dir, p.shape), lo, hi)
        dl = jnp.maximum(lt1, 0.0) / r.light_steps

        def body(j, tau):
            lp = p + ((j + 0.5) * dl)[..., None] * l_dir
            return tau + density_at(lp) * dl

        tau = jax.lax.fori_loop(0, r.light_steps, body,
                                jnp.zeros_like(dl))
        return jnp.exp(-tau)

    def step(s, carry):
        C, T = carry
        t = t0 + (s.astype(jnp.float32) + 0.5) * dt
        p = o + t[..., None] * d
        sigma = density_at(p)
        alpha = jnp.where(covered, 1.0 - jnp.exp(-sigma * dt), 0.0)
        atten = light_atten(p)
        c = albedo[:, None, :] * (light.color * _expand(atten)
                                  + light.ambient)
        C = C + (T * alpha)[..., None] * c
        T = T * (1.0 - alpha)
        return C, T

    P = pid.shape[0]
    C0 = jnp.zeros((P, tp, 3), jnp.float32)
    T0 = jnp.ones((P, tp), jnp.float32)
    C, T = jax.lax.fori_loop(0, r.steps, step, (C0, T0))
    return C, T


def _expand(atten):
    """Broadcast scalar-or-[P,tp] attenuation against [...,3] color."""
    if isinstance(atten, float):
        return atten
    return atten[..., None]


def composite_pairs(pairs: PairList, C_pair, t_pair, cfg: SceneConfig,
                    n_tiles_local: int | None = None, row_map=None):
    """Depth-ordered per-tile OVER compositing of marched pairs.
    ``row_map`` (optional, [P_kept] i32) redirects pair q to a row of the
    marched buffers — used when the march ran particle-grouped and its
    outputs are laid out [N*MT, ...] (pairs.sort_idx).
    Returns flat tiles [n_tiles_local, tp, 4] fp32 (see assemble_image)."""
    r = cfg.render
    tiles_x = r.width // r.tile_w
    tiles_y = r.height // r.tile_h
    n_tiles = n_tiles_local if n_tiles_local is not None \
        else tiles_x * tiles_y
    tp = r.tile_h * r.tile_w
    P = pairs.pid.shape[0]

    def body(k, carry):
        C, T = carry
        q = jnp.minimum(pairs.seg_start + k, P - 1)
        use = (k < pairs.count) & pairs.valid[q]
        row = row_map[q] if row_map is not None else q
        Ck = jnp.where(use[:, None, None], C_pair[row], 0.0)
        tk = jnp.where(use[:, None], t_pair[row], 1.0)
        C = C + T[..., None] * Ck
        T = T * tk
        return C, T

    C0 = jnp.zeros((n_tiles, tp, 3), jnp.float32)
    T0 = jnp.ones((n_tiles, tp), jnp.float32)
    K = min(r.max_pairs_per_tile, P)
    C, T = jax.lax.fori_loop(0, K, body, (C0, T0))

    bg = jnp.asarray(r.background, jnp.float32)
    return jnp.concatenate([C + T[..., None] * bg, (1.0 - T)[..., None]],
                           axis=-1)


def assemble_image(flat_tiles, cfg: SceneConfig):
    """[n_tiles, tp, 4] flat tiles -> [H, W, 4] frame."""
    r = cfg.render
    tiles_x = r.width // r.tile_w
    tiles_y = r.height // r.tile_h
    img = flat_tiles[:tiles_x * tiles_y].reshape(
        tiles_y, tiles_x, r.tile_h, r.tile_w, 4)
    return img.transpose(0, 2, 1, 3, 4).reshape(r.height, r.width, 4)


def render_tiles(particles: Particles, volumes, camera: Camera,
                 light: Light, cfg: SceneConfig, tile_start=0,
                 n_tiles_local: int | None = None):
    """Render a flat range of screen tiles (the shardable unit).
    Returns ([n_tiles_local, tp, 4] tiles, stats)."""
    V = volumes.shape[-1]
    bank2d = volumes.reshape(volumes.shape[0], -1)
    pairs = bin_particles(particles, camera, cfg, tile_start=tile_start,
                          n_tiles_local=n_tiles_local)
    C_pair, t_pair = _march_pairs(pairs, particles, bank2d, V, camera,
                                  light, cfg, tile_start=tile_start)
    tiles = composite_pairs(pairs, C_pair, t_pair, cfg,
                            n_tiles_local=n_tiles_local)
    return tiles, pairs.stats


def render(particles: Particles, volumes, camera: Camera, light: Light,
           cfg: SceneConfig):
    """Render one full frame on one device. Returns ([H,W,4] f32, stats)."""
    tiles, stats = render_tiles(particles, volumes, camera, light, cfg)
    return assemble_image(tiles, cfg), stats
