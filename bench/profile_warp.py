"""Per-component timing of the warp-engine frame on the real TPU.

Times the c3 (or given preset) frame's pieces in isolation so perf work
targets the measured bottleneck, not a guess:

  sim        fused sim step
  geometry   _grid_geometry + depth sort
  march      march_warp_pallas (the Pallas march/fan-warp kernel)
  composite  composite_chunk_pallas (depth-ordered canvas OVER)
  finish     canvas crop + background
  frame      the full jitted frame (engine/loop.frame)

Timing is fetch-synced (docs/DESIGN.md §5: block_until_ready is not a
reliable fence on the axon relay).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(out):
    x = jax.tree.leaves(out)[0]
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main(preset="c3", reps=10):
    from volq.scene.config import PRESETS
    from volq.engine import loop
    from volq.render.warp import (_grid_geometry, permute_for_march,
                                  render_warp)
    from volq.render.kernel import (march_warp_pallas, canvas_init_pallas,
                                    composite_chunk_pallas)
    from volq.sim.step import sim_step

    cfg = PRESETS[preset]()
    r = cfg.render
    state, camera, light = loop.setup(cfg)
    lv = loop.cached_light_volumes(state, light, cfg)
    sb = loop.cached_slab_banks(state, lv, cfg)
    # advance a few frames so the particle population is steady-state
    state, image, stats = loop.frame(state, camera, light, cfg, lv, sb)
    for _ in range(3):
        state, image, stats = loop.frame(state, camera, light, cfg, lv, sb)
    _sync(image)

    particles, volumes = state.particles, state.volumes
    h_local = r.height

    pP, vP, cP, lvP = permute_for_march(particles, volumes, camera, lv, cfg)

    @jax.jit
    def f_sim(st):
        return sim_step(st, cfg)

    @jax.jit
    def f_geom(p, cam):
        geom, st = _grid_geometry(p, cam, cfg, 0, h_local)
        z = jnp.where(geom["valid"], geom["vz"], jnp.inf)
        order = jnp.argsort(z, stable=True).astype(jnp.int32)
        return geom, order, st

    geom, order, _ = jax.jit(
        lambda p, cam: f_geom(p, cam))(pP, cP)
    geom = jax.device_get(geom) and geom  # keep on device

    sbP = None
    if sb is not None:
        from volq.render.warp import bake_march_slabs, slab_vx_eff
        wdt = jnp.float32 if r.warp_fp32 else jnp.bfloat16
        vx = slab_vx_eff(cfg, cfg.volume.size)
        sbP = jax.jit(lambda v, l: (
            bake_march_slabs(v, r.steps, wdt, vx),
            bake_march_slabs(l, r.steps, wdt, vx) if l is not None else None
        ))(vP, lvP)

    # NOTE: lvP/sbP are passed as ARGUMENTS, not closures — closed-over
    # device arrays are shipped as constants in the compile request (the
    # axon relay rejects multi-hundred-MB request bodies with HTTP 413)
    @functools.partial(jax.jit, static_argnames=())
    def f_march(p, v, cam, geom, lv_, sb_):
        imgs, sc = march_warp_pallas(p, v, cam, light, cfg, geom,
                                     light_volumes=lv_, slab_banks=sb_)
        return imgs

    images = f_march(pP, vP, cP, geom, lvP, sbP)
    _sync(images)

    canvas0 = jax.jit(lambda: canvas_init_pallas(cfg, h_local))()

    @jax.jit
    def f_comp(canvas, imgs, geom, order):
        return composite_chunk_pallas(canvas, imgs, geom, cfg, 0, h_local,
                                      order=order)

    @jax.jit
    def f_render(p, v, cam, lv_, sb_):
        img, st = render_warp(p, v, cam, light, cfg, light_volumes=lv_,
                              slab_banks=sb_)
        return img

    rays = r.width * r.height
    print(f"preset {preset}: N={cfg.n_particles} V={cfg.volume.size} "
          f"RP={r.warp_rect} S={r.steps} K={r.warp_shift_max} "
          f"backend={jax.default_backend()}", flush=True)

    def row(name, dt):
        print(f"  {name:<20} {dt*1e3:8.2f} ms   "
              f"({rays/dt/1e6:7.1f} Mrays/s-equiv)", flush=True)

    row("sim", timeit(f_sim, state, reps=reps))
    row("geometry+sort", timeit(f_geom, pP, cP, reps=reps))
    row("march(pallas)", timeit(f_march, pP, vP, cP, geom, lvP, sbP,
                                reps=reps))
    row("composite(pallas)", timeit(f_comp, canvas0, images, geom, order,
                                    reps=reps))
    row("render_warp(all)", timeit(f_render, pP, vP, cP, lvP, sbP,
                                   reps=reps))

    # frame donates state: rebind every call, never reuse the donated arg
    st2, image, stats = loop.frame(state, camera, light, cfg, lv, sb)
    _sync(image)
    t0 = time.perf_counter()
    for _ in range(reps):
        st2, image, stats = loop.frame(st2, camera, light, cfg, lv, sb)
    _sync(image)
    row("frame(full)", (time.perf_counter() - t0) / reps)


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["c3"]))
