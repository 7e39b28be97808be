"""Ray-AABB slab intersection (SURVEY.md C2 "slab test").

Semantics of record (mirrored in the oracle): the marched segment is
[t0, t1] with t0 = max(t_enter, 0), t1 = t_exit; a hit requires t1 > t0.
Degenerate direction components are made safe by clamping |d| >= 1e-12
with the original sign, which keeps all products finite and classifies
outside-parallel rays as misses.
"""
from __future__ import annotations

import jax.numpy as jnp

_TINY = 1e-12


def ray_aabb(origin, direction, lo, hi):
    """Slab test. origin/direction: [..., 3]; lo/hi: broadcastable [..., 3].

    Returns (t0, t1): the clipped entry/exit distances; the segment is empty
    (miss) iff t1 <= t0. Both are finite fp32.
    """
    d = direction
    sign = jnp.where(d >= 0, 1.0, -1.0)
    d_safe = jnp.where(jnp.abs(d) < _TINY, sign * _TINY, d)
    inv = 1.0 / d_safe
    ta = (lo - origin) * inv
    tb = (hi - origin) * inv
    tmin = jnp.minimum(ta, tb).max(axis=-1)
    tmax = jnp.maximum(ta, tb).min(axis=-1)
    t0 = jnp.maximum(tmin, 0.0)
    return t0, tmax
