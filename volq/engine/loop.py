"""Frame loop driver (SURVEY.md C10, call stack 3.5).

The host crosses the device boundary at most twice per displayed frame:
nothing in (state is resident, time is a device counter), and the image out
only when the caller actually fetches it.  ``frame`` is one jitted program:
sim step -> (optional per-frame 4D volume re-bake) -> bin -> march ->
composite, with per-frame stats returned device-side.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from volq.core.types import SceneState
from volq.render import render_frame
from volq.scene.config import SceneConfig
from volq.scene.state import init_scene, build_camera, build_light
from volq.sim.step import sim_step
from volq.volume.bake import bake_bank_4d
from volq.volume.lightbake import bake_light_volumes, dominant_axis


def _light_volumes(state, light, cfg: SceneConfig):
    """Slab engine + shadowing: per-frame baked light optical depth.
    (Static scenes recompute it too — it is cheap relative to the march;
    cache later if profiling says otherwise.)"""
    if cfg.render.engine in ("slab", "warp") and cfg.render.light_steps > 0:
        return bake_light_volumes(state.volumes, jnp.asarray(light.direction),
                                  axis=dominant_axis(cfg.light.direction))
    return None


def _frame_body(state: SceneState, camera, light, cfg: SceneConfig,
                light_volumes=None, slab_banks=None):
    """One sim+render frame (traced body shared by ``frame`` and the
    multi-frame ``frames`` scan)."""
    state = sim_step(state, cfg)
    if cfg.volume.animated:
        v = cfg.volume
        volumes = bake_bank_4d(v.bank_size, v.size, v.seed, state.time,
                               octaves=v.octaves, noise_scale=v.noise_scale,
                               time_scale=v.time_scale, cutoff=v.cutoff,
                               edge=v.edge)
        state = state._replace(volumes=volumes)
        light_volumes = None   # stale: volumes just changed
        slab_banks = None
    if light_volumes is None:
        light_volumes = _light_volumes(state, light, cfg)
    image, stats = render_frame(state.particles, state.volumes, camera,
                                light, cfg, light_volumes=light_volumes,
                                slab_banks=slab_banks)
    return state, image, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def frame(state: SceneState, camera, light, cfg: SceneConfig,
          light_volumes=None, slab_banks=None):
    """Advance one frame. Returns (new_state, image [H,W,4], stats).

    ``state`` is DONATED: without donation XLA copies the (possibly
    multi-GB) volume bank into the returned state every frame — measured
    13.7 ms/frame on config 3.  Callers must rebind, i.e.
    ``state, img, st = frame(state, ...)``.

    ``light_volumes`` / ``slab_banks``: pass the pre-baked
    light-transmittance bank and warp marching-slab banks for STATIC
    scenes (cached_light_volumes / cached_slab_banks) to skip the
    per-frame re-bakes; None re-bakes inside the frame (required when
    volumes are animated or the light moves)."""
    return _frame_body(state, camera, light, cfg, light_volumes,
                       slab_banks)


@functools.partial(jax.jit, static_argnames=("cfg", "n"),
                   donate_argnums=(0,))
def frames(state: SceneState, camera, light, cfg: SceneConfig,
           light_volumes=None, slab_banks=None, n: int = 1):
    """Advance ``n`` frames in ONE device dispatch (lax.scan over the
    frame body).  Returns (new_state, last image, stats stacked [n]).

    The per-dispatch host/relay round-trip measures ~1 ms on this
    environment — at config-3 frame times that is ~17% of the loop.
    Headless rendering and benchmarking that only fetch occasionally
    should batch frames per launch; ``frame`` remains the one-frame
    (lowest-latency) path and this scan produces BIT-IDENTICAL states
    and images (tests/test_engine.py)."""
    r = cfg.render
    H = r.height

    def body(carry, _):
        st, _img = carry
        st, img, stats = _frame_body(st, camera, light, cfg,
                                     light_volumes, slab_banks)
        return (st, img), stats

    img0 = jnp.zeros((H, r.width, 4), jnp.float32)
    (state, image), stats = jax.lax.scan(body, (state, img0), None,
                                         length=n)
    return state, image, stats


def cached_light_volumes(state: SceneState, light, cfg: SceneConfig):
    """Bake the light-transmittance bank ONCE for a static scene (the
    volumes and light direction never change between frames), or return
    None when a per-frame bake is required / no bake is needed."""
    if (cfg.volume.animated or cfg.render.light_steps <= 0
            or cfg.render.engine not in ("slab", "warp")):
        return None
    bake = jax.jit(lambda v, d: bake_light_volumes(
        v, d, axis=dominant_axis(cfg.light.direction)))
    return bake(state.volumes, jnp.asarray(light.direction))


def cached_slab_banks(state: SceneState, light_volumes, cfg: SceneConfig):
    """Bake the warp engine's marching slab banks ONCE for a static
    scene (render/warp.bake_march_slabs: the z-lerp constants are static
    per step, so the bank only changes when the volumes do).  Returns
    None when banks don't apply (other engines, animated volumes — the
    frame then bakes in-jit)."""
    from volq.render.warp import bake_slab_banks
    if cfg.volume.animated or cfg.render.engine != "warp":
        return None
    bake = jax.jit(functools.partial(bake_slab_banks, cfg=cfg))
    return bake(state.volumes, light_volumes)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_only(state: SceneState, camera, light, cfg: SceneConfig):
    """Render the current state without stepping (used by tests/bench)."""
    return render_frame(state.particles, state.volumes, camera, light, cfg,
                        light_volumes=_light_volumes(state, light, cfg))


def setup(cfg: SceneConfig):
    """Config -> (state, camera, light). The Start() analogue."""
    camera = build_camera(cfg.camera, cfg.render.width, cfg.render.height)
    light = build_light(cfg.light)
    # camera/light come out as host numpy: put them on device ONCE, or
    # every frame() call re-uploads all 9 leaves (~0.9 ms/frame of
    # DevicePut on the axon relay — measured in the c3 profile)
    camera = jax.device_put(camera)
    light = jax.device_put(light)
    state = init_scene(cfg)
    # `frame` donates the state; XLA CSE can alias identical constant
    # leaves (e.g. two all-zero arrays) to ONE buffer, which donation
    # then rejects ("donate the same buffer twice") — uniquify them.
    state = jax.tree.map(lambda a: a.copy() if hasattr(a, "copy") else a,
                         state)
    return state, camera, light


def run(cfg: SceneConfig, n_frames: int, *, warmup: int = 0,
        fetch_images: bool = True, on_frame=None):
    """Run the loop for n_frames (after ``warmup`` un-rendered sim steps).

    Returns (final_state, list of images or None, list of host stats dicts).
    """
    state, camera, light = setup(cfg)
    step_only = jax.jit(sim_step, static_argnames=("cfg",))
    for _ in range(warmup):
        state = step_only(state, cfg)
    lv = cached_light_volumes(state, light, cfg)
    sb = cached_slab_banks(state, lv, cfg)

    images, all_stats = [], []
    for i in range(n_frames):
        state, image, stats = frame(state, camera, light, cfg, lv, sb)
        if fetch_images:
            images.append(jax.device_get(image))
        host_stats = {k: int(v) for k, v in jax.device_get(stats).items()}
        all_stats.append(host_stats)
        if on_frame is not None:
            on_frame(i, image, host_stats)
    return state, images if fetch_images else None, all_stats


def _sync(x):
    """Force execution to complete.  jax.block_until_ready is NOT reliable
    on relayed backends (it can return before the computation ran —
    docs/DESIGN.md §5); fetching a scalar is.  Works for any array rank
    (a one-element lax.slice, no full-array reshape/transfer)."""
    x = jnp.asarray(x)
    if x.ndim:
        x = jax.lax.slice(x, (0,) * x.ndim, (1,) * x.ndim)
    return float(jnp.sum(x))


def time_frames(cfg: SceneConfig, n_frames: int, *, warmup: int = 2,
                fb: int = 48, mesh: int = 0, windows: int = 3,
                window_times: list | None = None):
    """THE benchmark harness (used by bench.py, bench/suite.py and the
    CLI --bench, so all three report the same number): steady-state
    seconds/frame with the image kept on device — only a tiny checksum
    is fetched per timing fence (SURVEY §3.5; block_until_ready lies on
    relayed backends, see _sync).

    ``fb`` frames are batched per device dispatch (the ``frames`` scan,
    bit-identical to ``frame``).  The default is the measured knee of
    the dispatch-amortization curve: the round-5 fb ladder on c3
    (bench/ladders/r5_fb_ladder_c3.json) measured 3.96 ms/frame at
    fb=12, 3.06 at fb=24, 2.98 at fb=48, 2.97 at fb=96 — the relay
    round-trip costs ~10-20 ms per dispatch in this environment, so
    the knee sits far above the ~1 ms/dispatch assumption rounds 2-4
    measured under (their fb=6/12 rows billed 1-2 ms/frame of relay
    overhead to the kernel).  ``mesh``
    shards the loop over that many devices (dist/sharded; fb then
    applies per-dispatch too).  The median of ``windows`` measurement
    windows is returned: single windows swing ±7% with TPU/relay
    contention on this environment.

    Returns (seconds_per_frame, host stats dict of the LAST frame).
    ``window_times``: pass a list to receive the raw per-window
    seconds/frame values (the noise band around the median)."""
    state, camera, light = setup(cfg)
    if mesh:
        from volq.dist.mesh import make_mesh
        from volq.dist.sharded import sharded_frame_fn, shard_state
        m = make_mesh(mesh)
        state = shard_state(state, m)
        fr = sharded_frame_fn(cfg, m, n_frames_per_call=fb)

        def step(st):
            return fr(st, camera, light)
    else:
        lv = cached_light_volumes(state, light, cfg)
        sb = cached_slab_banks(state, lv, cfg)

        def step(st):
            return frames(st, camera, light, cfg, lv, sb, n=fb)

    # compile + settle into the live loop's steady state
    for _ in range(1 + warmup):
        state, image, stats = step(state)
    _sync(image)
    reps = max(-(-n_frames // fb), 1)
    dts = []
    for _ in range(max(windows, 1)):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, image, stats = step(state)
        _sync(image)
        dts.append((time.perf_counter() - t0) / (reps * fb))
    dt = sorted(dts)[len(dts) // 2]
    if window_times is not None:
        window_times.extend(dts)
    stats = jax.device_get(stats)
    last = {k: (v[-1] if getattr(v, "ndim", 0) else v)
            for k, v in stats.items()}
    return dt, last
