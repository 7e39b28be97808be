"""Screen-space tile binning (SURVEY.md C5).

The reference covers pixels by rasterizing camera-facing billboards; the
TPU-native replacement is explicit: project each alive particle's AABB to a
conservative screen rectangle, enumerate the tiles it overlaps as
(tile, particle) *pairs*, and depth-order pairs per tile with a single
radix-style key sort (tile_id * 2^rank_bits + depth_rank) — the Gaussian-
splatting tile binning recipe (PAPERS.md: 3D Gaussian Ray Tracing), in pure
jnp sort/argsort with static shapes.

The marched pair list is compacted to ``max_pairs`` entries, so march cost
is proportional to actual screen coverage, not to a padded per-tile cap.
Every capacity cap is *counted* in the returned stats (never silent):
  * mt_overflow    — tiles lost because a particle spans > max_tiles_per_particle
  * cap_dropped    — valid pairs beyond the max_pairs budget
  * rank_dropped   — kept pairs beyond max_pairs_per_tile composite depth
"""
from __future__ import annotations

from typing import NamedTuple, Any

import jax.numpy as jnp

from volq.core.types import Camera, Particles
from volq.scene.config import SceneConfig

_NEAR_EPS = 1e-3
_INVALID_KEY = jnp.int32(2**31 - 1)


class PairList(NamedTuple):
    pid: Any        # [P] i32 particle index per kept pair
    tile: Any       # [P] i32 LOCAL tile id per kept pair (sorted ascending)
    valid: Any      # [P] bool
    seg_start: Any  # [T] i32 first pair index of each tile's segment
    count: Any      # [T] i32 number of kept pairs per tile
    sort_idx: Any   # [P] i32 flat (particle*MT + rank) slot of each kept
                    #     pair — lets a particle-grouped march buffer
                    #     [N*MT, ...] be indexed from the sorted pair list
    cand_tile: Any  # [N, MT] i32 LOCAL tile per candidate slot
    cand_valid: Any # [N, MT] bool candidate validity
    stats: Any      # dict of scalar diagnostics


def _corners(pos, size):
    """[N, 8, 3] world corners of each particle's cubic AABB."""
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32)
    return pos[:, None, :] + size[:, None, None] * signs[None]


def _screen_rect(particles: Particles, camera: Camera, cfg: SceneConfig):
    """Conservative pixel-space rect per particle + validity mask."""
    r = cfg.render
    W, H = r.width, r.height
    c = _corners(particles.pos, particles.size)          # [N,8,3]
    rel = c - camera.eye
    vx = rel @ camera.right
    vy = rel @ camera.up
    vz = rel @ camera.fwd

    if cfg.camera.projection == "persp":
        near = vz.min(axis=1) < _NEAR_EPS                # straddles near plane
        vz_safe = jnp.maximum(vz, _NEAR_EPS)
        ndc_x = vx / (vz_safe * camera.scale_x)
        ndc_y = vy / (vz_safe * camera.scale_y)
        in_front = vz.max(axis=1) > _NEAR_EPS
    else:
        near = jnp.zeros(c.shape[0], bool)
        ndc_x = vx / camera.scale_x
        ndc_y = vy / camera.scale_y
        in_front = vz.max(axis=1) > 0.0                  # some of box ahead

    px = (ndc_x + 1.0) * 0.5 * W
    py = (1.0 - ndc_y) * 0.5 * H
    x_min = jnp.where(near, 0.0, px.min(axis=1))
    x_max = jnp.where(near, float(W), px.max(axis=1))
    y_min = jnp.where(near, 0.0, py.min(axis=1))
    y_max = jnp.where(near, float(H), py.max(axis=1))

    alive = particles.age < particles.lifetime
    on_screen = (x_max >= 0) & (x_min <= W) & (y_max >= 0) & (y_min <= H)
    valid = alive & in_front & on_screen
    if r.near_fade_start > 0.0:
        # camera-proximity fade: fully transparent particles render
        # nothing — cull them before they explode the tile-span caps
        zc = (particles.pos - camera.eye) @ camera.fwd
        valid = valid & (zc > r.near_fade_end)
    return (x_min, x_max, y_min, y_max), valid


def bin_particles(particles: Particles, camera: Camera, cfg: SceneConfig,
                  tile_start=0, n_tiles_local: int | None = None) -> PairList:
    """Bin into the (global) flat-tile range
    [tile_start, tile_start + n_tiles_local).  ``tile_start`` may be traced
    (it is ``axis_index * n_tiles_local`` inside shard_map);
    ``n_tiles_local`` is static.  PairList.tile holds LOCAL tile ids.
    Defaults cover the whole screen."""
    r = cfg.render
    tiles_x = r.width // r.tile_w
    tiles_y = r.height // r.tile_h
    if n_tiles_local is None:
        n_tiles_local = tiles_x * tiles_y
    n_tiles = n_tiles_local
    N = particles.age.shape[0]
    MT = r.max_tiles_per_particle
    P = r.max_pairs
    tile_start = jnp.asarray(tile_start, jnp.int32)

    (x_min, x_max, y_min, y_max), valid = _screen_rect(particles, camera, cfg)

    tx0 = jnp.clip(jnp.floor(x_min / r.tile_w), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(x_max / r.tile_w), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(y_min / r.tile_h), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(y_max / r.tile_h), 0, tiles_y - 1).astype(jnp.int32)
    w_t = tx1 - tx0 + 1
    h_t = ty1 - ty0 + 1
    span = w_t * h_t
    mt_overflow = jnp.sum(jnp.where(valid, jnp.maximum(span - MT, 0), 0))

    # Depth rank: stable position in ascending view-z order among valid.
    z = (particles.pos - camera.eye) @ camera.fwd
    z = jnp.where(valid, z, jnp.inf)
    order = jnp.argsort(z, stable=True)
    rank = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))

    rank_bits = max(int(N - 1).bit_length(), 1)
    assert n_tiles < (2**31) >> rank_bits, "tile/rank key overflows int32"

    # Candidate pairs [N, MT], row-major over the particle's tile rect,
    # kept only if they land in this shard's local tile range.
    rr = jnp.arange(MT, dtype=jnp.int32)[None, :]
    dx = rr % w_t[:, None]
    dy = rr // w_t[:, None]
    cand_tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
    local_tile = cand_tile - tile_start
    cand_valid = (valid[:, None] & (rr < span[:, None])
                  & (local_tile >= 0) & (local_tile < n_tiles))
    key = jnp.where(cand_valid,
                    (local_tile << rank_bits) | rank[:, None],
                    _INVALID_KEY)

    flat_key = key.reshape(-1)
    sort_idx = jnp.argsort(flat_key)[:P]
    kept_key = flat_key[sort_idx]
    kept_valid = kept_key != _INVALID_KEY
    pair_pid = (sort_idx // MT).astype(jnp.int32)
    pair_tile = jnp.where(kept_valid, kept_key >> rank_bits, n_tiles)

    # Per-tile segments within the kept, tile-sorted pair list.
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(pair_tile, tids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(pair_tile, tids, side="right").astype(jnp.int32)
    count = seg_end - seg_start

    n_valid = jnp.sum(cand_valid.astype(jnp.int32))
    n_kept = jnp.sum(kept_valid.astype(jnp.int32))
    stats = {
        "alive": jnp.sum((particles.age < particles.lifetime).astype(jnp.int32)),
        "pairs_valid": n_valid,
        "pairs_kept": n_kept,
        "mt_overflow": mt_overflow,
        "cap_dropped": n_valid - n_kept,
        "rank_dropped": jnp.sum(
            jnp.maximum(count - r.max_pairs_per_tile, 0)),
        "max_pairs_per_tile_seen": count.max(),
    }
    return PairList(pid=pair_pid, tile=pair_tile, valid=kept_valid,
                    seg_start=seg_start, count=count,
                    sort_idx=sort_idx.astype(jnp.int32),
                    cand_tile=jnp.where(cand_valid, local_tile, 0),
                    cand_valid=cand_valid, stats=stats)
