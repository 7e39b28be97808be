"""Same-process A/B for the round-5 per-particle DMA-issue diet.

The r5 compound ablation (bench/ladders/r5_c4_ablation2.json) put c4's
residual BASE — march, epilogue and window DMAs all removed — at
5.43 ms = 2.65 us/pair, the frame's largest bucket.  The suspected
payer is per-grid-step small-block DMA issues: gf/rxu/ryw re-fetch
every grid step (3 tiny DMAs) and center mode streams PW light
mid-slabs (2 more).  The diet batches the first three CHB=8 steps at
a time and makes the light mid-slab bank VMEM-resident (kernel.py
CHB / MIDBANK) — both bit-identical math.

Arms (fresh jit each, same process — ±7% cross-process noise rule):
  both   : CHB=8 + mid-bank (the candidate)
  chb1   : mid-bank only
  nomid  : CHB=8 only
  neither: round-4 shipped protocol

Usage: python bench/dma_ab.py [preset] [arm ...]
"""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "both": (False, False),
    "chb1": (True, False),
    "nomid": (False, True),
    "neither": (True, True),
}


def main():
    import jax
    from volq.render import kernel
    from volq.scene.config import PRESETS
    from volq.engine.loop import (setup, _sync, _frame_body,
                                  cached_light_volumes, cached_slab_banks)

    preset = sys.argv[1] if len(sys.argv) > 1 else "c4"
    arms = sys.argv[2:] or list(ARMS)
    cfg = PRESETS[preset]()
    state, camera, light = setup(cfg)
    lv = cached_light_volumes(state, light, cfg)
    sb = cached_slab_banks(state, lv, cfg)

    FB = 6
    results = {}
    for arm in arms:
        chb1, nomid = ARMS[arm]
        kernel._FORCE_CHB1 = chb1
        kernel._NO_MIDBANK = nomid

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(0,))
        def fr(st, cam, li, lv_, sb_, n=1):
            def body(carry, _):
                st2, img, stats = _frame_body(carry, cam, li, cfg,
                                              lv_, sb_)
                return st2, img
            return jax.lax.scan(body, st, None, length=n)

        st = jax.tree.map(lambda a: a.copy(), state)
        st, image = fr(st, camera, light, lv, sb, n=FB)
        st, image = fr(st, camera, light, lv, sb, n=FB)
        _sync(image)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                st, image = fr(st, camera, light, lv, sb, n=FB)
            _sync(image)
            dts.append((time.perf_counter() - t0) / (3 * FB))
        dt = sorted(dts)[1]
        results[arm] = dt * 1e3
        print(f"{arm:>8}: {dt*1e3:7.3f} ms", flush=True)

    if "neither" in results:
        base = results["neither"]
        for m, v in results.items():
            if m != "neither":
                print(f"  {m:>8} saves {base - v:6.3f} ms "
                      f"({(base - v) / base * 100:+.1f}%)")


if __name__ == "__main__":
    main()
