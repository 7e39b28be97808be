"""On-device quality ladder for a preset: PSNR of the production warp
config (march-resolution decoupling, coarse steps, rect clipping)
against reference-quality variants of ITSELF and against the exact
per-ray engine.

Used to gate perf trades (RM, S, rect) with measured numbers instead of
guesses.  One steady-state frame is rendered per variant from the SAME
advanced state.

Usage: python bench/psnr_c3.py [preset] [variant ...]
Variants: base (the preset as shipped), rm0 (full-res march), rm80,
s20, s16, rect160, exact (per-ray gather march — minutes at 1080p).
Default: base rm0 rm80 s20 exact-skip.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a, b):
    err = np.asarray(a, np.float64)[..., :3] - np.asarray(b,
                                                          np.float64)[..., :3]
    return 10 * np.log10(1.0 / max(float(np.mean(err ** 2)), 1e-12))


def variant_cfg(cfg, name):
    """Compound variants compose with '+': e.g. rm64+s20+rect112."""
    for part in name.split("+"):
        r = cfg.render
        if part == "base":
            continue
        if part == "rm0":
            rr = dataclasses.replace(r, warp_march_rect=0,
                                     warp_slab_vx=0)
        elif part.startswith("vx"):
            rr = dataclasses.replace(r, warp_slab_vx=int(part[2:]))
        elif part.startswith("rm"):
            rr = dataclasses.replace(r, warp_march_rect=int(part[2:]))
        elif part.startswith("s"):
            rr = dataclasses.replace(r, steps=int(part[1:]))
        elif part.startswith("rect"):
            rr = dataclasses.replace(r, warp_rect=int(part[4:]))
        elif part == "exact":
            rr = dataclasses.replace(r, engine="exact")
        elif part == "perstep":
            rr = dataclasses.replace(r, light_mode="march")
        elif part == "coarse":
            rr = dataclasses.replace(r, warp_coarse=1)
        elif part == "ilv":
            rr = dataclasses.replace(r, warp_interleave=1)
        elif part == "nocoarse":
            rr = dataclasses.replace(r, warp_coarse=0)
        elif part == "noilv":
            rr = dataclasses.replace(r, warp_interleave=0)
        elif part == "nopair":
            rr = dataclasses.replace(r, warp_pair=0)
        elif part == "pair":
            rr = dataclasses.replace(r, warp_pair=1)
        elif part.startswith("hz"):
            rr = dataclasses.replace(r, warp_hazard_passes=int(part[2:]))
        elif part == "bf16c":
            rr = dataclasses.replace(r, warp_canvas_fp32=False)
        elif part == "swapbf16":
            rr = dataclasses.replace(r, warp_swap_bf16=1)
        elif part == "f32c":
            rr = dataclasses.replace(r, warp_canvas_fp32=True)
        elif part == "res":
            rr = dataclasses.replace(r, warp_canvas_vmem=1)
        elif part.startswith("cs"):
            # e.g. cs70 = warp_canvas_scale 0.70 (replaces warp_coarse)
            rr = dataclasses.replace(r, warp_canvas_scale=int(part[2:])
                                     / 100.0, warp_coarse=0)
        elif part.startswith("bands"):
            rr = dataclasses.replace(r, warp_bands=int(part[5:]))
        elif part.startswith("pk"):
            # e.g. pk4 = warp_pack 4 (QP pairs per grid entry)
            rr = dataclasses.replace(r, warp_pack=int(part[2:]))
        else:
            raise SystemExit(f"unknown variant {part}")
        cfg = dataclasses.replace(cfg, render=rr)
    return cfg


def main():
    import jax
    from volq.scene.config import PRESETS
    from volq.engine.loop import (setup, frame, render_only, _sync,
                                  cached_light_volumes, cached_slab_banks)

    preset = sys.argv[1] if len(sys.argv) > 1 else "c3"
    variants = sys.argv[2:] or ["base", "rm0", "rm80", "s20"]
    cfg = PRESETS[preset]()
    state, camera, light = setup(cfg)
    lv = cached_light_volumes(state, light, cfg)
    sb = cached_slab_banks(state, lv, cfg)
    # settle into a representative steady state
    for _ in range(12):
        state, image, stats = frame(state, camera, light, cfg, lv, sb)
    _sync(image)

    imgs = {}
    base_stats = None
    for name in ["base"] + [v for v in variants if v != "base"]:
        vcfg = variant_cfg(cfg, name)
        img, stats = render_only(state, camera, light, vcfg)
        imgs[name] = np.asarray(jax.device_get(img))
        if name == "base":
            base_stats = {k: int(v) for k, v in
                          jax.device_get(stats).items()}
        print(f"{name:>8}: rendered", flush=True)

    # Reference preference: exact > plain rm0 > any compound ending in
    # rm0 (e.g. ``perstep+rm0`` when gating per-step-lit arms against a
    # full-resolution march of the SAME shading mode) > base.
    compound_rm0 = [n for n in imgs if n.endswith("+rm0")]
    ref = ("exact" if "exact" in imgs
           else "rm0" if "rm0" in imgs
           else compound_rm0[0] if compound_rm0 else "base")
    print(f"\npreset {preset}; reference = {ref}; base stats: "
          f"{base_stats}")
    for name, img in imgs.items():
        if name == ref:
            continue
        print(f"  {name:>8} vs {ref}: {psnr(img, imgs[ref]):6.2f} dB")
    if "rm0" in imgs and ref != "rm0":
        for name, img in imgs.items():
            if name in (ref, "rm0"):
                continue
            print(f"  {name:>8} vs rm0: {psnr(img, imgs['rm0']):6.2f} dB")


if __name__ == "__main__":
    main()
