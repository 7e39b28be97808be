"""Extended benchmark suite: per-config frame time / Mrays/s / sim rate.

Usage:  python bench/suite.py [c1 c2 c3 c4 ...]
Prints one JSON object per config (stderr-free; safe to redirect).
The single-line headline bench for the driver remains /root/repo/bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(name: str, n_frames: int = 96, fb: int = 48):
    import jax
    from volq.scene.config import PRESETS
    from volq.engine.loop import setup, time_frames, _sync
    from volq.sim.step import sim_step

    # 'c4:perstep'-style variant rows (psnr_c3.variant_cfg vocabulary)
    base, _, variant = name.partition(":")
    cfg = PRESETS[base]()
    if variant:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from psnr_c3 import variant_cfg
        cfg = variant_cfg(cfg, variant)

    # the shared harness (engine/loop.time_frames): frames batched per
    # dispatch, fetch-synced, median-of-3 windows — the same numbers as
    # bench.py and the CLI --bench
    band = []
    t0 = time.perf_counter()
    frame_s, stats = time_frames(cfg, n_frames, fb=fb, windows=3,
                                 window_times=band)
    # rough compile estimate: wall time minus the frames actually run
    # (warmup + 3 windows of ceil(n/fb) dispatches, fb frames each)
    n_run = (3 + 3 * -(-n_frames // fb)) * fb
    compile_s = max(time.perf_counter() - t0 - n_run * frame_s, 0.0)

    # sim-only rate
    jstep = jax.jit(sim_step, static_argnames=("cfg",))
    s = setup(cfg)[0]
    s = jstep(s, cfg)
    _sync(s.particles.pos)
    t0 = time.perf_counter()
    for _ in range(50):
        s = jstep(s, cfg)
    _sync(s.particles.pos)
    sim_s = (time.perf_counter() - t0) / 50

    rays = cfg.render.width * cfg.render.height
    return {
        "config": name,
        "resolution": f"{cfg.render.width}x{cfg.render.height}",
        "particles": cfg.n_particles,
        "steps": cfg.render.steps,
        "light_steps": cfg.render.light_steps,
        "frame_ms": round(frame_s * 1e3, 3),
        "fps": round(1.0 / frame_s, 1),
        "mrays_per_s": round(rays / frame_s / 1e6, 1),
        "window_mrays": sorted(round(rays / w / 1e6, 1) for w in band),
        "sim_steps_per_s": round(1.0 / sim_s, 1),
        "compile_s": round(compile_s, 1),
        "engine_flags": engine_flags(cfg),
        "stats": {k: int(v) for k, v in jax.device_get(stats).items()},
    }


def engine_flags(cfg):
    """The per-row engine knobs BASELINE.md's table reports, pulled from
    the ACTUAL preset (so the table can never drift from the shipped
    config — the round-3 failure mode)."""
    from volq.render.warp import march_rect, slab_vx_eff
    from volq.render.kernel import pair_enabled, stack_bank_resident
    import numpy as np
    r = cfg.render
    f = {"engine": r.engine}
    if r.engine == "warp":
        lit = r.light_steps > 0
        center = lit and r.light_mode == "center"
        V = cfg.volume.size
        VX = slab_vx_eff(cfg, V)
        # EFFECTIVE pairing (the kernel's own envelope mirror), not the
        # config flag — a c4:perstep row must not claim "paired"
        bank = np.zeros((cfg.volume.bank_size, r.steps, VX, V),
                        "float32" if r.warp_fp32 else "float16")
        resident = stack_bank_resident((bank, None), lit, center)
        pair = pair_enabled(cfg, cfg.n_particles, True, lit, center,
                            resident)
        f.update(rect=r.warp_rect, rm=march_rect(cfg), vx=VX,
                 pair=int(pair), fused=int(bool(r.warp_fused)),
                 coarse=int(bool(r.warp_coarse)),
                 ilv=int(bool(r.warp_interleave)),
                 pack=int(r.warp_pack),
                 dtype="fp32" if r.warp_fp32 else "bf16")
        if r.light_steps > 0:
            f["light"] = r.light_mode
    return f


def bench_c5_shard_slice(n_frames: int = 24, fb: int = 12):
    """The per-chip slice of BASELINE config 5 on ONE chip: the exact
    per-shard body of the 8-way binary-swap frame — sharded 4D re-bake
    (bank/8 entries), sim, and march+composite of the shard's 1/8 depth
    slice over the full 4K canvas.  (The swap combine itself needs the
    mesh; it moves exactly ONE cropped canvas per chip over ICI —
    measured + projected in bench/c5_combine_model.py.)  The resulting
    Mrays/s is the per-chip SLICE number; the mesh frame adds the
    projected combine cost on top (BASELINE.md c5 row).

    ``fb`` frames are batched per device dispatch with lax.scan —
    the SAME dispatch cadence as the production mesh loop
    (dist/sharded.sharded_frame_fn n_frames_per_call) and the shared
    time_frames harness, so the slice row is measured like every other
    row.  Rounds 3–4 dispatched one frame per relay round-trip here,
    which billed ~1–2 ms/frame of relay overhead to the slice (the
    488-vs-515 r4/r3 discrepancy; env override VOLQ_C5_FB re-measures
    the cadence)."""
    import jax
    import jax.numpy as jnp
    from volq.scene.config import PRESETS
    from volq.engine.loop import setup, _sync
    from volq.render.warp import render_warp_canvas, _canvas_finish
    from volq.sim.step import sim_step
    from volq.volume.bake import bake_bank_4d
    from volq.volume.lightbake import bake_light_volumes, dominant_axis

    cfg = PRESETS["c5"]()
    state, camera, light = setup(cfg)
    n_shards = 8
    n_p = cfg.n_particles // n_shards
    v = cfg.volume

    import functools

    fb = int(os.environ.get("VOLQ_C5_FB", fb))

    def shard_frame(state):
        state = sim_step(state, cfg)
        ids_local = jnp.arange(v.bank_size // n_shards, dtype=jnp.int32)
        local = bake_bank_4d(v.bank_size, v.size, v.seed, state.time,
                             octaves=v.octaves, noise_scale=v.noise_scale,
                             time_scale=v.time_scale, cutoff=v.cutoff,
                             edge=v.edge, ids=ids_local)
        # stand-in for the all_gather: tile the local bake to full size
        volumes = jnp.tile(local, (n_shards, 1, 1, 1))
        state = state._replace(volumes=volumes)
        # in-frame light bake, exactly as dist/sharded.py's shard body
        light_volumes = None
        if cfg.render.light_steps > 0:
            light_volumes = bake_light_volumes(
                volumes, jnp.asarray(light.direction, jnp.float32),
                axis=dominant_axis(cfg.light.direction))
        p = state.particles
        z = jnp.where(p.age < p.lifetime,
                      (p.pos - camera.eye) @ camera.fwd, jnp.inf)
        ids = jnp.argsort(z, stable=True).astype(jnp.int32)[:n_p]
        parts_k = jax.tree.map(lambda a: a[ids], p)
        canvas, stats = render_warp_canvas(parts_k, volumes, camera,
                                           light, cfg,
                                           light_volumes=light_volumes)
        img = _canvas_finish(canvas[:3], canvas[3], cfg,
                             cfg.render.height)
        return state, img, stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    def shard_frames(state):
        def body(carry, _):
            st, _img = carry
            st, img, stats = shard_frame(st)
            return (st, img), stats
        img0 = jnp.zeros((cfg.render.height, cfg.render.width, 4),
                         jnp.float32)
        (state, image), stats = jax.lax.scan(body, (state, img0),
                                             None, length=fb)
        return state, image, stats

    for _ in range(2):          # compile + settle
        state, image, stats = shard_frames(state)
    _sync(image)
    # 3 windows -> a same-session band, so the row can say whether a
    # slice-rate delta is preset cost or relay drift (the r4 488 vs r3
    # 515-518 question could not be answered from a single window)
    reps = max(-(-n_frames // fb), 1)
    band = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, image, stats = shard_frames(state)
        _sync(image)
        band.append((time.perf_counter() - t0) / (reps * fb))
    dt = sorted(band)[1]
    rays = cfg.render.width * cfg.render.height
    return {
        "config": "c5 per-chip shard slice (16k/8 particles, 4K, "
                  "animated bake, lit)",
        "frame_ms": round(dt * 1e3, 3),
        "mrays_per_chip_s": round(rays / dt / 1e6, 1),
        "window_mrays": sorted(round(rays / w / 1e6, 1) for w in band),
        "engine_flags": engine_flags(cfg),
        "stats": {k: int(v_[-1] if getattr(v_, "ndim", 0) else v_)
                  for k, v_ in
                  __import__("jax").device_get(stats).items()},
    }


if __name__ == "__main__":
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    names = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["c1", "c2", "c3", "c4", "c5shard"]
    records = []
    for n in names:
        if n == "c5shard":
            records.append(bench_c5_shard_slice())
        else:
            records.append(bench_config(n))
        print(json.dumps(records[-1]), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1)
