"""On-device bit-exactness check for the paired fused march (warp_pair).

Renders one c4 frame with warp_pair=0 and =1 from the same state and
asserts the canvases are IDENTICAL: the paired kernel's zero-block
packing adds exact zeros and the MXU accumulates K in sequential
order, so pairing must not change a single bit (render/kernel.py PAIR;
round-3 result: max |diff| = 0.0).  Interpret mode (CPU) regroups dot
sums when K widens, so this check is meaningful on the real chip only.

Usage: python bench/pair_bitcheck.py [preset]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from volq.scene.config import PRESETS
    from volq.engine.loop import setup, render_only, _sync

    preset = sys.argv[1] if len(sys.argv) > 1 else "c4"
    cfg0 = PRESETS[preset]()
    cfg0 = dataclasses.replace(cfg0, render=dataclasses.replace(
        cfg0.render, warp_pair=0))
    cfg1 = dataclasses.replace(cfg0, render=dataclasses.replace(
        cfg0.render, warp_pair=1))
    state, camera, light = setup(cfg0)
    t0 = time.perf_counter()
    a, sa = render_only(state, camera, light, cfg0)
    _sync(a)
    print(f"unpaired compiled+ran {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    b, sb = render_only(state, camera, light, cfg1)
    _sync(b)
    print(f"paired compiled+ran {time.perf_counter() - t0:.1f} s")
    a = np.asarray(jax.device_get(a))
    b = np.asarray(jax.device_get(b))
    d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
    print(f"max |diff|: {d}")
    print(f"bit-equal: {np.array_equal(a, b)}")
    print("alpha max:", a[..., 3].max(),
          "stats:", {k: int(v) for k, v in jax.device_get(sb).items()})
    assert np.array_equal(a, b), "paired canvas differs from unpaired"


if __name__ == "__main__":
    main()
