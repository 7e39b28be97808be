"""Dispatch-amortization knee for the headline config (DESIGN 5h#4).

At round-2's 5.9 ms frames the fb=12 batching knee left ~2% of frame
time in per-dispatch relay round-trips; at ~4.2 ms frames that share
grows, so re-measure the knee: one process, time_frames at several
frames-per-dispatch values, same windows protocol as bench.py.

Usage: python bench/fb_sweep.py [preset] [fb ...]   (default c3 12 18 24 36)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from volq.scene.config import PRESETS
    from volq.engine.loop import time_frames

    args = sys.argv[1:]
    preset = args[0] if args and not args[0].isdigit() else "c3"
    fbs = [int(a) for a in args if a.isdigit()] or [12, 18, 24, 36]
    cfg = PRESETS[preset]()
    rays = cfg.render.width * cfg.render.height
    out = {"preset": preset, "fb": {}}
    for fb in fbs:
        band = []
        # 2*fb measured frames per window keeps wall time comparable
        dt, _ = time_frames(cfg, 2 * fb, fb=fb, windows=3,
                            window_times=band)
        out["fb"][fb] = {"ms": round(dt * 1e3, 3),
                         "mrays": round(rays / dt / 1e6, 1),
                         "band_ms": [round(b * 1e3, 3) for b in band]}
        print(f"{preset} fb={fb:3d}: {dt*1e3:7.3f} ms "
              f"{rays/dt/1e6:6.1f} Mrays/s "
              f"band={[f'{b*1e3:.2f}' for b in band]}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
