"""Same-process A/B of warp_pair (paired fused march) per preset.

Usage: python bench/pair_ab.py [preset]
Round-3 numbers (1x v5e, fb=12, median-of-3): c3 4.03 vs 4.07 ms
(neutral — RM=96 already fills the MXU tiles), c4 11.17 -> 10.46 ms,
c5 single-chip 86.2 -> 81.4 ms.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volq.scene.config import PRESETS
from volq.engine.loop import time_frames


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "c4"
    for pair in (0, 1):
        cfg = PRESETS[preset]()
        cfg = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, warp_pair=pair))
        dt, stats = time_frames(cfg, 24, fb=12, windows=3)
        rays = cfg.render.width * cfg.render.height
        print(f"{preset} warp_pair={pair}: {dt*1e3:.3f} ms  "
              f"{rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
