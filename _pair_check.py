import dataclasses, time, sys
import numpy as np
import jax
from volq.scene.config import PRESETS
from volq.engine.loop import setup, render_only, _sync

cfg0 = PRESETS["c4"]()
cfg1 = dataclasses.replace(cfg0, render=dataclasses.replace(
    cfg0.render, warp_pair=1))
state, camera, light = setup(cfg0)
t0 = time.perf_counter()
a, sa = render_only(state, camera, light, cfg0)
_sync(a)
print("unpaired compiled+ran", round(time.perf_counter() - t0, 1), "s")
t0 = time.perf_counter()
b, sb = render_only(state, camera, light, cfg1)
_sync(b)
print("paired compiled+ran", round(time.perf_counter() - t0, 1), "s")
a = np.asarray(jax.device_get(a)); b = np.asarray(jax.device_get(b))
print("max |diff|:", np.abs(a.astype(np.float64) - b.astype(np.float64)).max())
print("bit-equal:", np.array_equal(a, b))
print("alpha max:", a[..., 3].max(), "stats:", {k: int(v) for k, v in jax.device_get(sb).items()})
