"""Emission (SURVEY.md C1): deterministic ring-buffer spawning.

The particle array is a fixed pool of N slots; a slot is dead when
age >= lifetime.  Each frame a fractional spawn budget accumulates
(rate * dt + carry); floor(budget) dead slots — the first by slot order —
are revived with freshly sampled attributes.

All randomness is threefry (jax.random) keyed per-slot:
fold_in(fold_in(base_key, frame), slot).  Counter-based per-slot keys make
attribute generation independent of array layout, so a particle-sharded sim
(dist/) produces bit-identical particles to the single-chip step, and the
whole history is replayable from (config, key, frame) — the deterministic
replay / fault-recovery story of SURVEY.md section 5.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volq.scene.config import EmitterConfig


def _spawn_one(key, ecfg: EmitterConfig, bank_size: int):
    """Fresh attributes for a single slot from its private key."""
    kp, kr, kv, kl, ks, ka, kb = jax.random.split(key, 7)
    d = jax.random.normal(kp, (3,), jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-6)
    r = ecfg.radius * jax.random.uniform(kr, (), jnp.float32) ** (1.0 / 3.0)
    pos = jnp.asarray(ecfg.center, jnp.float32) + d * r
    vel = (jnp.asarray(ecfg.vel_base, jnp.float32)
           + ecfg.vel_spread * jax.random.normal(kv, (3,), jnp.float32))
    lifetime = jax.random.uniform(kl, (), jnp.float32,
                                  ecfg.life_min, ecfg.life_max)
    size = jax.random.uniform(ks, (), jnp.float32,
                              ecfg.size_min, ecfg.size_max)
    albedo = (jnp.asarray(ecfg.albedo_base, jnp.float32)
              * (1.0 - ecfg.albedo_var
                 * jax.random.uniform(ka, (3,), jnp.float32)))
    vol_idx = jax.random.randint(kb, (), 0, bank_size, jnp.int32)
    return dict(pos=pos, vel=vel, lifetime=lifetime, size=size,
                albedo=albedo, vol_idx=vol_idx)


def spawn_attrs(key, slot_ids, ecfg: EmitterConfig, bank_size: int):
    """Sample fresh attributes for the given (global) slot ids.

    Returns a dict of [len(slot_ids), ...] arrays. Deterministic per
    (key, slot id), independent of how slots are sharded.
    """
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(slot_ids)
    return jax.vmap(lambda k: _spawn_one(k, ecfg, bank_size))(keys)


def emission_step(key, dead_mask, spawn_carry, rate: float, dt,
                  rank_offset=0):
    """Which local slots spawn this frame.

    ``rank_offset`` is the number of dead slots on shards that precede this
    one in slot order (0 on a single device), making sharded emission
    semantics exactly equal to the single-chip step.

    Returns (spawn_mask [N] bool, new_carry [] f32).
    """
    budget = spawn_carry + rate * dt
    n_spawn = jnp.floor(budget)
    new_carry = budget - n_spawn
    rank = rank_offset + jnp.cumsum(dead_mask.astype(jnp.int32)) - 1
    spawn_mask = dead_mask & (rank.astype(jnp.float32) < n_spawn)
    return spawn_mask, new_carry
