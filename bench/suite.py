"""Extended benchmark suite: per-config frame time / Mrays/s / sim rate.

Usage:  python bench/suite.py [c1 c2 c3 c4 ...]
Prints one JSON object per config (stderr-free; safe to redirect).
The single-line headline bench for the driver remains /root/repo/bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(name: str, n_frames: int = 20):
    import jax
    from volq.scene.config import PRESETS
    from volq.engine.loop import setup, frame
    from volq.sim.step import sim_step

    from volq.engine.loop import _sync

    cfg = PRESETS[name]()
    state, camera, light = setup(cfg)

    t0 = time.perf_counter()
    state2, image, stats = frame(state, camera, light, cfg)
    _sync(image)
    compile_s = time.perf_counter() - t0

    for _ in range(3):
        state2, image, stats = frame(state2, camera, light, cfg)
    _sync(image)
    t0 = time.perf_counter()
    for _ in range(n_frames):
        state2, image, stats = frame(state2, camera, light, cfg)
    _sync(image)
    frame_s = (time.perf_counter() - t0) / n_frames

    # sim-only rate
    jstep = jax.jit(sim_step, static_argnames=("cfg",))
    s = jstep(state, cfg)
    _sync(s.particles.pos)
    t0 = time.perf_counter()
    for _ in range(50):
        s = jstep(s, cfg)
    _sync(s.particles.pos)
    sim_s = (time.perf_counter() - t0) / 50

    rays = cfg.render.width * cfg.render.height
    return {
        "config": name,
        "resolution": f"{cfg.render.width}x{cfg.render.height}",
        "particles": cfg.n_particles,
        "steps": cfg.render.steps,
        "light_steps": cfg.render.light_steps,
        "frame_ms": round(frame_s * 1e3, 3),
        "fps": round(1.0 / frame_s, 1),
        "mrays_per_s": round(rays / frame_s / 1e6, 1),
        "sim_steps_per_s": round(1.0 / sim_s, 1),
        "compile_s": round(compile_s, 1),
        "stats": {k: int(v) for k, v in jax.device_get(stats).items()},
    }


if __name__ == "__main__":
    names = sys.argv[1:] or ["c1", "c2", "c3", "c4"]
    for n in names:
        print(json.dumps(bench_config(n)), flush=True)
