from volq.render.binning import bin_particles, PairList
from volq.render.xla_render import (render, render_tiles, composite_pairs,
                                    assemble_image)
from volq.render.slab import render_slab, render_slab_tiles
from volq.render.warp import render_warp


def render_frame(particles, volumes, camera, light, cfg, light_volumes=None,
                 slab_banks=None):
    """Engine-dispatching full-frame render (cfg.render.engine)."""
    if cfg.render.engine == "warp":
        return render_warp(particles, volumes, camera, light, cfg,
                           light_volumes=light_volumes,
                           slab_banks=slab_banks)
    if cfg.render.engine == "slab":
        return render_slab(particles, volumes, camera, light, cfg,
                           light_volumes=light_volumes)
    return render(particles, volumes, camera, light, cfg)


def render_frame_tiles(particles, volumes, camera, light, cfg, tile_start=0,
                       n_tiles_local=None, light_volumes=None):
    """Engine-dispatching tile-range render (the shardable unit)."""
    if cfg.render.engine == "slab":
        return render_slab_tiles(particles, volumes, camera, light, cfg,
                                 tile_start=tile_start,
                                 n_tiles_local=n_tiles_local,
                                 light_volumes=light_volumes)
    return render_tiles(particles, volumes, camera, light, cfg,
                        tile_start=tile_start, n_tiles_local=n_tiles_local)


__all__ = ["bin_particles", "PairList", "render", "render_tiles",
           "composite_pairs", "assemble_image", "render_slab",
           "render_slab_tiles", "render_warp", "render_frame",
           "render_frame_tiles"]
