"""Fan/rect budget sweep (VERDICT round-2 item 8): run a preset's live
loop for N frames and record the ACTUAL maxima the budgets must cover —
max |fan shift| (march cells and pixels), screen-footprint max/p99, and
the counted losses (rect_overflow, shift_clamped) — so warp_shift_max
and warp_rect are set from data, not guesses.

Usage: python bench/budget_sweep.py [presets ...] [--frames N]
Prints one JSON line per preset.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sweep(preset: str, n_frames: int = 120):
    import jax
    import jax.numpy as jnp
    from volq.scene.config import PRESETS
    from volq.engine.loop import (setup, frame, _sync,
                                  cached_light_volumes, cached_slab_banks)
    from volq.render.warp import (_grid_geometry, fan_shifts,
                                  permute_for_march, march_rect,
                                  needs_row_fan)

    cfg = PRESETS[preset]()
    r = cfg.render
    RP = r.warp_rect
    RM = march_rect(cfg)
    ratio = (RP - 1) / max(RM - 1, 1)
    state, camera, light = setup(cfg)
    lv = cached_light_volumes(state, light, cfg)
    sb = cached_slab_banks(state, lv, cfg)

    @jax.jit
    def frame_budgets(particles, volumes):
        p2, v2, c2, _ = permute_for_march(particles, volumes, camera,
                                          None, cfg)
        geom, st = _grid_geometry(p2, c2, cfg, 0, r.height)
        du, dw = fan_shifts(c2, cfg, geom["sx0"], geom["sy0"],
                            geom["px_c"], geom["py_c"])
        valid = geom["valid"]
        v3 = valid[:, None, None]
        du_max = jnp.max(jnp.abs(du) * v3)
        dw_max = (jnp.max(jnp.abs(dw) * v3) if dw is not None
                  else jnp.float32(0.0))
        foot = jnp.maximum(geom["foot_w"], geom["foot_h"])
        footv = jnp.where(valid, foot, 0.0)
        foot_max = jnp.max(footv)
        foot_p99 = jnp.percentile(jnp.where(valid, foot, jnp.nan), 99,
                                  method="nearest")
        return (du_max, dw_max, foot_max,
                jnp.nan_to_num(foot_p99), st["rect_overflow"])

    du_m = dw_m = foot_m = foot_p = 0.0
    overflow = 0
    clamped = 0
    for _ in range(n_frames):
        state, image, stats = frame(state, camera, light, cfg, lv, sb)
        b = jax.device_get(frame_budgets(state.particles, state.volumes))
        du_m = max(du_m, float(b[0]))
        dw_m = max(dw_m, float(b[1]))
        foot_m = max(foot_m, float(b[2]))
        foot_p = max(foot_p, float(b[3]))
        overflow = max(overflow, int(b[4]))
        clamped = max(clamped, int(jax.device_get(stats)["shift_clamped"]))
    _sync(image)

    return {
        "preset": preset, "frames": n_frames,
        "warp_rect": RP, "march_rect": RM,
        "K_px": r.warp_shift_max,
        "du_max_cells": round(du_m, 2),
        "du_max_px": round(du_m * ratio, 2),
        "dw_max_cells": round(dw_m, 2),
        "foot_max_px": round(foot_m, 1),
        "foot_p99_px": round(foot_p, 1),
        "rect_overflow_max": overflow,
        "shift_clamped_max": clamped,
        "n_particles": cfg.n_particles,
    }


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 120
    for a in sys.argv[1:]:
        if a.startswith("--frames"):
            n = int(a.split("=")[1])
    for p in (args or ["c2", "c3", "c4", "c5"]):
        print(json.dumps(sweep(p, n)), flush=True)
