"""Simulation tests (SURVEY.md section 4): Euler step vs closed form,
emission ring-buffer conservation, lifecycle, determinism, curl field
divergence."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from volq.scene.config import (SceneConfig, EmitterConfig, ForcesConfig,
                               VolumeConfig, RenderConfig)
from volq.scene.state import init_scene
from volq.sim.step import sim_step
from volq.sim.forces import curl_noise, total_force


def _cfg(**kw):
    base = dict(
        n_particles=16, init="random", seed=3,
        volume=VolumeConfig(size=8, bank_size=2, octaves=1),
        emitter=EmitterConfig(radius=1.0, life_min=50.0, life_max=50.0),
        render=RenderConfig(width=128, height=8, steps=4, max_pairs=64,
                            max_pairs_per_tile=8),
    )
    base.update(kw)
    return SceneConfig(**base)


def test_ballistic_matches_closed_form():
    g = (0.0, -9.8, 0.0)
    cfg = _cfg(forces=ForcesConfig(gravity=g))
    state = init_scene(cfg)
    p0 = np.asarray(state.particles.pos, np.float64)
    v0 = np.asarray(state.particles.vel, np.float64)
    k = 10
    for _ in range(k):
        state = sim_step(state, cfg)
    dt = cfg.dt
    gv = np.asarray(g)
    # explicit Euler with v-first update:
    # v_i = v0 + i*g*dt ; p_k = p0 + dt * sum_{i=1..k} v_i
    v_k = v0 + k * gv * dt
    p_k = p0 + dt * (k * v0 + gv * dt * (k * (k + 1) / 2))
    assert np.allclose(np.asarray(state.particles.vel), v_k, atol=1e-4)
    assert np.allclose(np.asarray(state.particles.pos), p_k, atol=1e-4)


def test_emission_conservation():
    # Start empty; rate fills exactly floor(cumulative budget) slots.
    cfg = _cfg(init="empty",
               emitter=EmitterConfig(rate=90.0, life_min=100.0,
                                     life_max=100.0),
               dt=1.0 / 30.0)
    state = init_scene(cfg)
    expected = 0.0
    for i in range(8):
        state = sim_step(state, cfg)
        expected += 90.0 * cfg.dt
        alive = int(np.sum(np.asarray(state.particles.age)
                           < np.asarray(state.particles.lifetime)))
        assert alive == min(int(expected), cfg.n_particles), f"frame {i}"


def test_lifecycle_death_and_respawn():
    cfg = _cfg(init="random",
               emitter=EmitterConfig(rate=0.0, life_min=0.05, life_max=0.05),
               init_age_frac=(0.0, 0.0), dt=0.02)
    state = init_scene(cfg)
    for _ in range(4):  # ages reach 0.08 > 0.05
        state = sim_step(state, cfg)
    alive = np.asarray(state.particles.age) < np.asarray(
        state.particles.lifetime)
    assert not alive.any()


def test_spawned_particles_have_fresh_attrs():
    cfg = _cfg(init="empty",
               emitter=EmitterConfig(rate=1000.0, radius=2.0,
                                     life_min=1.0, life_max=2.0,
                                     size_min=0.2, size_max=0.4),
               dt=1.0 / 30.0)
    state = init_scene(cfg)
    state = sim_step(state, cfg)
    p = state.particles
    alive = np.asarray(p.age) < np.asarray(p.lifetime)
    assert alive.all()
    assert np.asarray(p.age)[alive].max() == 0.0
    s = np.asarray(p.size)[alive]
    assert (s >= 0.2).all() and (s <= 0.4).all()
    assert np.linalg.norm(np.asarray(p.pos)[alive], axis=-1).max() <= 2.0001


def test_determinism():
    cfg = _cfg(forces=ForcesConfig(gravity=(0, -1, 0), drag=0.2,
                                   curl_strength=0.8))
    s1 = init_scene(cfg)
    s2 = init_scene(cfg)
    for _ in range(5):
        s1 = sim_step(s1, cfg)
        s2 = sim_step(s2, cfg)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_curl_noise_divergence_free():
    fc = ForcesConfig(curl_strength=1.0, curl_freq=0.7)
    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, (256, 3), jnp.float32, -4.0, 4.0)
    t = jnp.zeros((256,), jnp.float32)
    h = 0.02

    def comp(q, a):
        return curl_noise(q, t, fc)[..., a]

    div = 0.0
    for a in range(3):
        e = jnp.zeros((3,)).at[a].set(h)
        div = div + (comp(p + e, a) - comp(p - e, a)) / (2 * h)
    div = np.asarray(div)
    mag = np.abs(np.asarray(curl_noise(p, t, fc))).mean()
    # numerical curl => divergence vanishes to FD truncation error
    assert np.abs(div).mean() < 0.15 * max(mag, 1e-3)


def test_fused_step_is_jittable_and_matches_eager():
    cfg = _cfg(forces=ForcesConfig(gravity=(0, -1, 0), drag=0.1,
                                   curl_strength=0.5),
               emitter=EmitterConfig(rate=60.0, life_min=0.5, life_max=1.0))
    jstep = jax.jit(sim_step, static_argnames=("cfg",))
    s1 = s2 = init_scene(cfg)
    for _ in range(5):
        s1 = sim_step(s1, cfg)
        s2 = jstep(s2, cfg)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert np.allclose(np.asarray(a, np.float64),
                           np.asarray(b, np.float64), atol=1e-6)
