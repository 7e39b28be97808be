"""Scene construction: config -> initial SceneState + numeric camera/light.

The reference's Start() path (SURVEY.md call stack 3.1: allocate particle
buffers, bake the density Texture3D, bind uniforms) becomes one pure
function; the volume bake runs on device, so there is no upload boundary.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from volq.core.types import Particles, SceneState, Camera, Light
from volq.core.camera import make_camera
from volq.scene.config import SceneConfig, LightConfig, CameraConfig
from volq.sim.emit import spawn_attrs
from volq.volume.bake import bake_bank, bake_bank_4d


def build_camera(ccfg: CameraConfig, width: int, height: int) -> Camera:
    return make_camera(ccfg.eye, ccfg.look_at, ccfg.up,
                       fov_y_deg=ccfg.fov_y_deg, aspect=width / height,
                       ortho_half_h=ccfg.ortho_half_h,
                       projection=ccfg.projection)


def build_light(lcfg: LightConfig) -> Light:
    d = np.asarray(lcfg.direction, np.float32)
    d = d / np.linalg.norm(d)
    return Light(direction=d, color=np.asarray(lcfg.color, np.float32),
                 ambient=np.asarray(lcfg.ambient, np.float32))


def bake_volumes(cfg: SceneConfig, t=0.0):
    v = cfg.volume
    if v.animated:
        return bake_bank_4d(v.bank_size, v.size, v.seed, t,
                            octaves=v.octaves, noise_scale=v.noise_scale,
                            time_scale=v.time_scale, cutoff=v.cutoff,
                            edge=v.edge)
    return bake_bank(v.bank_size, v.size, v.seed, octaves=v.octaves,
                     noise_scale=v.noise_scale, cutoff=v.cutoff,
                     edge=v.edge)


def _init_particles(cfg: SceneConfig, key) -> Particles:
    n = cfg.n_particles
    e = cfg.emitter
    zeros3 = jnp.zeros((n, 3), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)

    if cfg.init == "empty":
        # All dead (age >= lifetime); emission fills the pool.
        return Particles(pos=zeros3, vel=zeros3, age=zeros, lifetime=zeros,
                         size=zeros + e.size_min,
                         albedo=jnp.ones((n, 3), jnp.float32),
                         vol_idx=jnp.zeros((n,), jnp.int32))

    if cfg.init == "single":
        life = jnp.full((n,), e.life_max, jnp.float32)
        return Particles(
            pos=jnp.broadcast_to(jnp.asarray(e.center, jnp.float32), (n, 3)),
            vel=zeros3, age=0.5 * life, lifetime=life,
            size=jnp.full((n,), e.size_max, jnp.float32),
            albedo=jnp.broadcast_to(
                jnp.asarray(e.albedo_base, jnp.float32), (n, 3)),
            vol_idx=jnp.zeros((n,), jnp.int32))

    ka, kj, kf = jax.random.split(key, 3)
    fresh = spawn_attrs(ka, jnp.arange(n, dtype=jnp.int32), e,
                        cfg.volume.bank_size)
    lo, hi = cfg.init_age_frac
    age = fresh["lifetime"] * jax.random.uniform(kf, (n,), jnp.float32, lo, hi)

    pos = fresh["pos"]
    if cfg.init == "grid":
        k = int(np.ceil(n ** (1.0 / 3.0)))
        idx = jnp.arange(n)
        gx, gy, gz = idx // (k * k), (idx // k) % k, idx % k
        g = (jnp.stack([gx, gy, gz], -1).astype(jnp.float32)
             - (k - 1) / 2.0) / max(k - 1, 1) * 2.0
        jitter = 0.15 * e.radius * jax.random.normal(kj, (n, 3), jnp.float32)
        pos = jnp.asarray(e.center, jnp.float32) + g * e.radius + jitter
    elif cfg.init != "random":
        raise ValueError(f"unknown init mode {cfg.init!r}")

    return Particles(pos=pos, vel=fresh["vel"], age=age,
                     lifetime=fresh["lifetime"], size=fresh["size"],
                     albedo=fresh["albedo"], vol_idx=fresh["vol_idx"])


def init_scene(cfg: SceneConfig) -> SceneState:
    base_key = jax.random.PRNGKey(cfg.seed)
    init_key = jax.random.fold_in(base_key, 0x5EED)
    return SceneState(
        particles=_init_particles(cfg, init_key),
        volumes=bake_volumes(cfg, t=0.0),
        frame=jnp.int32(0),
        spawn_carry=jnp.float32(0.0),
        time=jnp.float32(0.0),
        base_key=base_key,
    )
