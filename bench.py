"""Headline benchmark: ray throughput on BASELINE config 3
(1k advected particles, per-particle 128^3 volumes, 1080p render loop).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/500}
where the baseline is the driver target of 500 Mrays/s per v5e chip
(BASELINE.md; the reference publishes no numbers of its own).

The measured quantity is the full frame step (sim + march + composite)
in steady state with the image kept on device — pixels/sec/1e6.  The
harness is engine/loop.time_frames (shared with bench/suite.py and the
CLI --bench, so all three report the same number): 12 frames per device
dispatch (measured knee of the dispatch-amortization curve, DESIGN.md
§5e), fetch-synced fences, median of 3 measurement windows.
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from volq.scene.config import c3
    from volq.engine.loop import time_frames

    cfg = c3()
    dt, _stats = time_frames(cfg, 24, fb=12, windows=3)

    rays = cfg.render.width * cfg.render.height
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "ray_throughput_c3_1080p_1k_particles",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
