"""The fused simulation step (SURVEY.md C1, call stack 3.2).

The reference's per-frame CPU loop (emission, explicit Euler advection
under gravity/drag/curl, age/fade lifecycle, then a CPU->GPU buffer upload)
becomes ONE jitted elementwise XLA program over the SoA pytree — no host
round-trip, no dynamic shapes.  Step order of record:

  1. key       = fold_in(base_key, frame)
  2. age'      = age + dt
  3. dead      = age' >= lifetime
  4. emission  = first floor(carry + rate*dt) dead slots (in global slot
                 order) revived with fresh attributes at age 0; spawned
                 slots do NOT advect on their birth frame
  5. advection = v += f(p, v, t) * dt ; p += v * dt   (explicit Euler,
                 alive non-spawned slots only)
  6. frame += 1 ; time += dt

When ``axis_name`` is given the step runs inside shard_map with the
particle axis sharded: emission ranks are made global with a psum-style
prefix over shards, and per-slot counter-based PRNG (sim/emit.py) keeps
every attribute bit-identical to the single-chip step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volq.core.types import Particles, SceneState
from volq.scene.config import SceneConfig
from volq.sim.emit import spawn_attrs, emission_step
from volq.sim.forces import total_force


def sim_step(state: SceneState, cfg: SceneConfig,
             axis_name: str | None = None) -> SceneState:
    p = state.particles
    n_local = p.age.shape[0]
    dt = jnp.float32(cfg.dt)
    key = jax.random.fold_in(state.base_key, state.frame)

    age = p.age + dt
    dead = age >= p.lifetime

    if axis_name is None:
        slot_offset = 0
        rank_offset = 0
    else:
        idx = jax.lax.axis_index(axis_name)
        slot_offset = idx * n_local
        counts = jax.lax.all_gather(jnp.sum(dead.astype(jnp.int32)),
                                    axis_name)
        rank_offset = jnp.cumsum(counts)[idx] - counts[idx]

    spawn_mask, new_carry = emission_step(
        key, dead, state.spawn_carry, cfg.emitter.rate, dt,
        rank_offset=rank_offset)
    slot_ids = slot_offset + jnp.arange(n_local, dtype=jnp.int32)
    fresh = spawn_attrs(key, slot_ids, cfg.emitter, cfg.volume.bank_size)

    sm = spawn_mask
    sm3 = sm[:, None]
    pos = jnp.where(sm3, fresh["pos"], p.pos)
    vel = jnp.where(sm3, fresh["vel"], p.vel)
    age = jnp.where(sm, 0.0, age)
    lifetime = jnp.where(sm, fresh["lifetime"], p.lifetime)
    size = jnp.where(sm, fresh["size"], p.size)
    albedo = jnp.where(sm3, fresh["albedo"], p.albedo)
    vol_idx = jnp.where(sm, fresh["vol_idx"], p.vol_idx)

    advect = (~dead) & (~sm)
    f = total_force(pos, vel, state.time, cfg.forces)
    vel_new = vel + f * dt
    pos_new = pos + vel_new * dt
    vel = jnp.where(advect[:, None], vel_new, vel)
    pos = jnp.where(advect[:, None], pos_new, pos)

    return SceneState(
        particles=Particles(pos=pos, vel=vel, age=age, lifetime=lifetime,
                            size=size, albedo=albedo, vol_idx=vol_idx),
        volumes=state.volumes,
        frame=state.frame + 1,
        spawn_carry=new_carry,
        time=state.time + dt,
        base_key=state.base_key,
    )
