"""Same-process A/B of arbitrary render-flag variants per preset.

The axon relay's cross-process timing noise is ±7% (volq-env-gotchas),
so flag decisions must come from ONE process timing every variant with
the shared harness.  Variants use bench/psnr_c3.py's compound syntax
(e.g. ``ilv``, ``coarse+ilv``, ``perstep+coarse``); ``base`` is the
preset as shipped.

Usage:  python bench/flag_ab.py c4 base ilv coarse coarse+ilv
Prints one line per variant (ms + Mrays/s + key stats) and a final
JSON record for the log.
"""
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from psnr_c3 import variant_cfg  # noqa: E402


def main():
    from volq.scene.config import PRESETS
    from volq.engine.loop import time_frames

    preset = sys.argv[1] if len(sys.argv) > 1 else "c4"
    variants = sys.argv[2:] or ["base", "ilv", "coarse", "coarse+ilv"]
    cfg0 = PRESETS[preset]()
    rays = cfg0.render.width * cfg0.render.height
    out = {"preset": preset, "variants": {}}
    for name in variants:
        # ``fbN`` tokens set the frames-per-dispatch of the timing
        # harness itself (dispatch-amortization ladder), not a cfg flag.
        fb = 12
        cfg_parts = []
        for part in name.split("+"):
            if part.startswith("fb") and part[2:].isdigit():
                fb = int(part[2:])
            else:
                cfg_parts.append(part)
        cfg = variant_cfg(cfg0, "+".join(cfg_parts) or "base")
        band = []
        dt, stats = time_frames(cfg, max(24, 2 * fb), fb=fb, windows=3,
                                window_times=band)
        mrays = rays / dt / 1e6
        out["variants"][name] = {
            "ms": round(dt * 1e3, 3), "mrays": round(mrays, 1),
            "band_ms": [round(b * 1e3, 3) for b in band],
            "stats": {k: int(v) for k, v in stats.items()}}
        print(f"{preset} {name:>16}: {dt*1e3:7.3f} ms  {mrays:6.1f} "
              f"Mrays/s  band={[f'{b*1e3:.2f}' for b in band]}",
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
