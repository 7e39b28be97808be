"""In-process c3 ablation ladder: time the full frame with one class of
in-kernel work removed per mode (wrong images; perf attribution only).

Within-process A/B is the only trustworthy comparison on this
environment (run-to-run noise is ±7%, docs/DESIGN.md §6); each mode
rebuilds a FRESH jit of the frame body after monkeypatching
volq.render.kernel._ABLATE (the env var is read at import time, so the
module global is patched directly).

Usage: python bench/ablate_c3.py [preset] [mode ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["", "weights", "dot1", "dot2", "fan", "up", "comp", "windma",
         "gxy", "march"]


def main():
    import jax
    from volq.render import kernel
    from volq.scene.config import PRESETS
    from volq.engine.loop import (setup, _sync, _frame_body,
                                  cached_light_volumes, cached_slab_banks)

    preset = sys.argv[1] if len(sys.argv) > 1 else "c3"
    modes = sys.argv[2:] or MODES
    cfg = PRESETS[preset]()
    state, camera, light = setup(cfg)
    lv = cached_light_volumes(state, light, cfg)
    sb = cached_slab_banks(state, lv, cfg)

    FB = 6
    results = {}
    for mode in modes:
        kernel._ABLATE = mode

        # donation is load-bearing: without it XLA copies the multi-GB
        # volume bank every frame.  camera/lv/sb are ARGUMENTS, not
        # closure constants: closed-over device arrays serialize into
        # the HLO shipped to the remote compiler (HTTP 413 at c3 scale).
        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(0,))
        def fr(st, cam, li, lv_, sb_, n=1):
            def body(carry, _):
                st2, img, stats = _frame_body(carry, cam, li, cfg,
                                              lv_, sb_)
                return st2, img
            return jax.lax.scan(body, st, None, length=n)

        # real device-side copies: fr donates its input, and `state`
        # must survive for the next mode
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
        results[mode or "full"] = dt * 1e3
        print(f"{mode or 'full':>8}: {dt*1e3:7.3f} ms", flush=True)

    base = results.get("full")
    if base:
        for m, v in results.items():
            if m != "full":
                print(f"  {m:>8} saves {base - v:6.3f} ms")


if __name__ == "__main__":
    main()
