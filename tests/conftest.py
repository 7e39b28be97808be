"""Test harness: run everything on the CPU backend with 8 virtual devices
(SURVEY.md section 4 "multi-chip without a cluster") so the same shard_map
code paths that run on a real v5e-8 mesh are exercised in CI. Must set env
before jax is imported anywhere."""
import os
import sys

# Some environments pre-import jax from sitecustomize (pinning a TPU
# platform), so plain env vars are too late here; jax.config.update after
# import still works, and XLA_FLAGS is read at first backend init.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from volq.scene.config import (  # noqa: E402
    SceneConfig, VolumeConfig, EmitterConfig, ForcesConfig, CameraConfig,
    LightConfig, RenderConfig,
)


@pytest.fixture(scope="session")
def tiny_cfg():
    """A small multi-particle scene that renders in seconds on CPU."""
    return SceneConfig(
        n_particles=8, init="grid", seed=11,
        volume=VolumeConfig(size=16, bank_size=4, octaves=2),
        emitter=EmitterConfig(radius=1.6, size_min=0.5, size_max=0.9,
                              life_min=100.0, life_max=100.0,
                              albedo_base=(1.0, 0.9, 0.8), albedo_var=0.3),
        camera=CameraConfig(eye=(0.3, 0.8, -5.0), fov_y_deg=50.0),
        render=RenderConfig(width=128, height=64, steps=8,
                            max_tiles_per_particle=32, max_pairs=256,
                            max_pairs_per_tile=16, density_scale=10.0),
    )


@pytest.fixture(scope="session")
def tiny_lit_cfg(tiny_cfg):
    import dataclasses
    return dataclasses.replace(
        tiny_cfg, render=dataclasses.replace(tiny_cfg.render, light_steps=4))


def max_abs_diff(a, b):
    return float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
