"""On-device bit-exactness check for grid packing (warp_pack).

Renders one frame with warp_pack=1 and =QP from the same state and
asserts the canvases are IDENTICAL: packing runs the same per-pair ops
in the same order inside fewer grid entries (kernel.py _pair_iter), so
not a single bit may change — on ANY backend (unlike warp_pair, no dot
shapes change, so even interpret mode must match exactly; this script
is the real-chip record for preset flips).

Usage: python bench/pack_bitcheck.py [preset] [packs...]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from volq.scene.config import PRESETS
    from volq.engine.loop import setup, render_only, _sync

    preset = sys.argv[1] if len(sys.argv) > 1 else "c4"
    packs = [int(a) for a in sys.argv[2:]] or [2, 4]
    cfg0 = PRESETS[preset]()
    cfg0 = dataclasses.replace(cfg0, render=dataclasses.replace(
        cfg0.render, warp_pack=1))
    state, camera, light = setup(cfg0)
    t0 = time.perf_counter()
    a, sa = render_only(state, camera, light, cfg0)
    _sync(a)
    print(f"pack=1 compiled+ran {time.perf_counter() - t0:.1f} s",
          flush=True)
    a = np.asarray(a)
    ok = True
    for qp in packs:
        cfg1 = dataclasses.replace(cfg0, render=dataclasses.replace(
            cfg0.render, warp_pack=qp))
        t0 = time.perf_counter()
        b, sb = render_only(state, camera, light, cfg1)
        _sync(b)
        d = np.abs(np.asarray(b, np.float64)
                   - np.asarray(a, np.float64)).max()
        print(f"pack={qp} compiled+ran {time.perf_counter() - t0:.1f} s"
              f"  max |diff| = {d}", flush=True)
        ok = ok and d == 0.0
    print("BIT-IDENTICAL" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
