"""Checkpoint / resume (SURVEY.md section 5).

SceneState is a pure pytree, so a checkpoint is just its leaves plus the
config JSON; the deterministic sim (threefry keyed on the frame counter)
makes a restore frame-exact: running K frames from a restored state is
bit-identical to running them without the save/load round trip (tested in
tests/test_engine.py).
"""
from __future__ import annotations

import json

import numpy as np
import jax

from volq.core.types import Particles, SceneState
from volq.scene.config import SceneConfig, to_json, from_json

_PARTICLE_FIELDS = list(Particles._fields)
_STATE_SCALARS = ["frame", "spawn_carry", "time", "base_key"]


def save_state(path: str, state: SceneState, cfg: SceneConfig):
    arrays = {f"p_{f}": np.asarray(getattr(state.particles, f))
              for f in _PARTICLE_FIELDS}
    arrays["volumes"] = np.asarray(state.volumes, np.float32)
    for f in _STATE_SCALARS:
        arrays[f] = np.asarray(getattr(state, f))
    np.savez(path, config=to_json(cfg), **arrays)


def load_state(path: str):
    """Returns (state, cfg). Arrays are host numpy; jit will device_put."""
    import jax.numpy as jnp
    z = np.load(path, allow_pickle=False)
    cfg = from_json(str(z["config"]))
    particles = Particles(**{f: jnp.asarray(z[f"p_{f}"])
                             for f in _PARTICLE_FIELDS})
    state = SceneState(
        particles=particles,
        volumes=jnp.asarray(z["volumes"]).astype(jnp.bfloat16),
        frame=jnp.asarray(z["frame"]),
        spawn_carry=jnp.asarray(z["spawn_carry"]),
        time=jnp.asarray(z["time"]),
        base_key=jnp.asarray(z["base_key"]),
    )
    return state, cfg
