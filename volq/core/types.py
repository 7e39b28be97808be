"""Core pytree types shared by the simulator, renderer, and oracle.

These are NamedTuples so they are automatically JAX pytrees; all numeric
fields are arrays (jnp on device, np in the oracle).  Static configuration
lives in ``volq.scene.config`` as frozen dataclasses instead.

Mirrors the reference's scene/state API surface (SURVEY.md C9): particle
buffers, 3D density volumes, camera + light parameters.
"""
from __future__ import annotations

from typing import NamedTuple, Any


class Camera(NamedTuple):
    """Numeric camera state. Projection kind (persp/ortho) is static config.

    For perspective: ``scale_x/scale_y`` are tan(half-fov) per axis.
    For orthographic: they are the view half-extents in world units.
    ``right/up/fwd`` form an orthonormal basis; image y grows downward.
    """

    eye: Any      # [3] f32
    right: Any    # [3] f32
    up: Any       # [3] f32
    fwd: Any      # [3] f32
    scale_x: Any  # [] f32
    scale_y: Any  # [] f32


class Light(NamedTuple):
    """Directional light. ``direction`` is a unit vector pointing *toward*
    the light (i.e. the direction secondary shadow rays march)."""

    direction: Any  # [3] f32
    color: Any      # [3] f32
    ambient: Any    # [3] f32


class Particles(NamedTuple):
    """Structure-of-arrays particle state (SURVEY.md C1).

    A particle is alive iff ``age < lifetime``.  ``size`` is the half-extent
    of its cubic world-space AABB.  ``vol_idx`` selects a density volume from
    the scene's volume bank.  ``albedo`` is fixed at emission time.
    """

    pos: Any       # [N,3] f32 world position (AABB center)
    vel: Any       # [N,3] f32
    age: Any       # [N]   f32 seconds
    lifetime: Any  # [N]   f32 seconds
    size: Any      # [N]   f32 AABB half-extent (cube)
    albedo: Any    # [N,3] f32
    vol_idx: Any   # [N]   i32 index into the volume bank


class SceneState(NamedTuple):
    """Everything that evolves frame to frame. A pure pytree: trivially
    checkpointable (engine.checkpoint) and deterministic given (config, key,
    frame) — the replay/fault-recovery story (SURVEY.md section 5)."""

    particles: Particles
    volumes: Any     # [M,V,V,V] density bank (bf16 storage, fp32 math)
    frame: Any       # [] i32 frame counter
    spawn_carry: Any # [] f32 fractional emission budget carried over
    time: Any        # [] f32 simulation time in seconds
    base_key: Any    # [2] u32 jax PRNG key; per-frame keys are fold_in(frame)
