"""Particle forces (SURVEY.md C1): gravity, linear drag, curl noise.

Curl noise is the divergence-free turbulence field of Bridson et al.:
the curl of a vector potential whose three components are independent
Perlin fBm fields.  Derivatives are central finite differences (h in world
units) — deterministic, backend-exact, and cheap VPU work.
"""
from __future__ import annotations

import jax.numpy as jnp

from volq.volume.noise import perlin3
from volq.scene.config import ForcesConfig

_FD_H = 0.05
# World-space offsets decorrelating the three potential components.
_POT_OFF = ((0.0, 0.0, 0.0), (31.416, 47.853, 12.793), (-19.113, 33.437, 7.661))


def _potential(p, comp: int, t, cfg: ForcesConfig):
    off = jnp.asarray(_POT_OFF[comp], jnp.float32)
    q = p * cfg.curl_freq + off
    # slow upward scroll of the field over time for a live look
    q = q + jnp.stack([jnp.zeros_like(t), 0.1 * t, jnp.zeros_like(t)], -1)
    return perlin3(q, cfg.curl_seed + comp)


def curl_noise(p, t, cfg: ForcesConfig):
    """Divergence-free velocity field at world points p [..., 3]."""
    h = _FD_H

    def dd(comp, axis):
        e = jnp.zeros((3,), jnp.float32).at[axis].set(h)
        return (_potential(p + e, comp, t, cfg)
                - _potential(p - e, comp, t, cfg)) / (2.0 * h)

    cx = dd(2, 1) - dd(1, 2)
    cy = dd(0, 2) - dd(2, 0)
    cz = dd(1, 0) - dd(0, 1)
    return jnp.stack([cx, cy, cz], axis=-1)


def total_force(pos, vel, t, cfg: ForcesConfig):
    """Per-particle force (acceleration; unit mass) [N, 3]."""
    f = jnp.broadcast_to(jnp.asarray(cfg.gravity, jnp.float32), pos.shape)
    f = f - cfg.drag * vel
    if cfg.curl_strength != 0.0:
        tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), pos.shape[:-1])
        f = f + cfg.curl_strength * curl_noise(pos, tt, cfg)
    return f
