"""Tile binning tests (SURVEY.md C5): kept pairs are tile-sorted and
depth-ordered within a tile, off-screen particles produce no pairs, and the
binning is *conservative* versus a brute-force coverage check (every
pixel-covering particle appears in that tile's list)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from volq.core.aabb import ray_aabb
from volq.core.camera import pixel_rays
from volq.engine.loop import setup
from volq.render.binning import bin_particles


def test_pairs_sorted_and_depth_ordered(tiny_cfg):
    state, camera, light = setup(tiny_cfg)
    pairs = bin_particles(state.particles, camera, tiny_cfg)
    valid = np.asarray(pairs.valid)
    tiles = np.asarray(pairs.tile)[valid]
    pids = np.asarray(pairs.pid)[valid]
    assert (np.diff(tiles) >= 0).all(), "pairs sorted by tile"
    z = np.asarray((state.particles.pos - camera.eye) @ camera.fwd)
    for t in np.unique(tiles):
        zt = z[pids[tiles == t]]
        assert (np.diff(zt) >= 0).all(), f"tile {t} depth-ordered"


def test_conservative_vs_brute_force(tiny_cfg):
    state, camera, light = setup(tiny_cfg)
    cfg = tiny_cfg
    r = cfg.render
    pairs = bin_particles(state.particles, camera, cfg)
    valid = np.asarray(pairs.valid)
    kept = set(zip(np.asarray(pairs.tile)[valid].tolist(),
                   np.asarray(pairs.pid)[valid].tolist()))

    tiles_x = r.width // r.tile_w
    px, py = jnp.meshgrid(jnp.arange(r.width), jnp.arange(r.height))
    o, d = pixel_rays(camera, px, py, r.width, r.height,
                      cfg.camera.projection)
    p = state.particles
    for pid in range(cfg.n_particles):
        half = float(p.size[pid])
        lo = np.asarray(p.pos[pid]) - half
        hi = np.asarray(p.pos[pid]) + half
        t0, t1 = ray_aabb(o, d, jnp.asarray(lo), jnp.asarray(hi))
        covered = np.asarray(t1 > t0)
        ys, xs = np.nonzero(covered)
        for y, x in zip(ys[:: max(1, len(ys) // 50)],
                        xs[:: max(1, len(xs) // 50)]):
            tile = (y // r.tile_h) * tiles_x + (x // r.tile_w)
            assert (tile, pid) in kept, \
                f"covered pixel ({x},{y}) of particle {pid} not binned"


def test_offscreen_and_dead_produce_no_pairs(tiny_cfg):
    state, camera, light = setup(tiny_cfg)
    p = state.particles
    # teleport all particles far behind the camera
    behind = p._replace(pos=p.pos - 1000.0 * jnp.asarray(camera.fwd))
    pairs = bin_particles(behind, camera, tiny_cfg)
    assert int(np.asarray(pairs.stats["pairs_valid"])) == 0
    # kill all particles in place
    dead = p._replace(age=p.lifetime + 1.0)
    pairs = bin_particles(dead, camera, tiny_cfg)
    assert int(np.asarray(pairs.stats["pairs_valid"])) == 0
    assert int(np.asarray(pairs.stats["alive"])) == 0


def test_tile_range_restriction(tiny_cfg):
    """Binning a local tile range must equal the slice of the global bins."""
    state, camera, light = setup(tiny_cfg)
    cfg = tiny_cfg
    r = cfg.render
    n_tiles = (r.width // r.tile_w) * (r.height // r.tile_h)
    full = bin_particles(state.particles, camera, cfg)
    half = n_tiles // 2
    lo = bin_particles(state.particles, camera, cfg, tile_start=0,
                       n_tiles_local=half)
    hi = bin_particles(state.particles, camera, cfg, tile_start=half,
                       n_tiles_local=n_tiles - half)

    def kept(pairs, offset=0):
        v = np.asarray(pairs.valid)
        return list(zip((np.asarray(pairs.tile)[v] + offset).tolist(),
                        np.asarray(pairs.pid)[v].tolist()))

    assert kept(lo) + kept(hi, offset=half) == kept(full)
