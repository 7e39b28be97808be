"""Command-line demo/driver (SURVEY.md C10): render frames from a preset or
a JSON config to PNG/npy, benchmark, save/restore checkpoints.

Examples:
  python -m volq.cli --preset c2 --frames 8 --out out/ --png
  python -m volq.cli --preset c3 --bench
  python -m volq.cli --config my.json --frames 60 --checkpoint ck.npz
  python -m volq.cli --preset c1 --set render.steps=64 --frames 1 --png
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _apply_override(cfg, assignment: str):
    """--set a.b.c=json_value on nested frozen dataclasses."""
    path, _, raw = assignment.partition("=")
    try:
        val = json.loads(raw)
    except json.JSONDecodeError:
        val = raw
    keys = path.split(".")

    def rec(obj, ks):
        if len(ks) == 1:
            if isinstance(val, list):
                return dataclasses.replace(obj, **{ks[0]: tuple(val)})
            return dataclasses.replace(obj, **{ks[0]: val})
        return dataclasses.replace(obj, **{ks[0]: rec(getattr(obj, ks[0]),
                                                      ks[1:])})

    return rec(cfg, keys)


def _respect_platform_env():
    """Some environments force-register a TPU platform from sitecustomize
    at interpreter start, which makes a user-provided JAX_PLATFORMS env
    var ineffective (it is read before the override).  Re-assert it via
    jax.config BEFORE any backend initialization so
    `JAX_PLATFORMS=cpu python -m volq.cli ...` does what it says."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            return
    except Exception:
        pass
    jax.config.update("jax_platforms", want)


def main(argv=None):
    _respect_platform_env()
    ap = argparse.ArgumentParser(prog="volq", description=__doc__)
    ap.add_argument("--preset", choices=["c1", "c2", "c3", "c4", "c5"])
    ap.add_argument("--config", help="JSON config file")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="override config fields, e.g. render.steps=16")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--frames-per-launch", type=int, default=1,
                    metavar="N", help="advance N frames per device "
                    "dispatch (engine.loop.frames; bit-identical — "
                    "only every Nth frame's image is fetched/saved)")
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--out", default="out")
    ap.add_argument("--png", action="store_true", help="save PNG frames")
    ap.add_argument("--npy", action="store_true", help="save npy frames")
    ap.add_argument("--gif", metavar="PATH",
                    help="collect every rendered frame into an animated "
                    "GIF at PATH (downscaled to --gif-width)")
    ap.add_argument("--gif-width", type=int, default=960,
                    help="max GIF width in pixels (default 960)")
    ap.add_argument("--gif-fps", type=float, default=30.0)
    ap.add_argument("--dolly", type=float, default=0.0, metavar="F",
                    help="animate the camera eye toward look_at over the "
                    "run, covering this fraction of the distance "
                    "(fly-through; composes with --orbit)")
    ap.add_argument("--orbit", type=float, default=0.0, metavar="DEG",
                    help="orbit the camera around look_at by this many "
                    "degrees over the run")
    ap.add_argument("--bench", action="store_true",
                    help="time steady-state frames instead of saving")
    ap.add_argument("--checkpoint", help="save final state here (.npz)")
    ap.add_argument("--resume", help="load state from this checkpoint")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard over this many devices (0 = single)")
    ap.add_argument("--profile", metavar="DIR",
                    help="capture a jax.profiler trace of the frame loop")
    ap.add_argument("--dump-config", action="store_true")
    args = ap.parse_args(argv)

    from volq.scene.config import PRESETS, from_json, to_json
    from volq.engine import loop, io, checkpoint

    if args.config:
        cfg = from_json(open(args.config).read())
    elif args.preset:
        cfg = PRESETS[args.preset]()
    else:
        ap.error("need --preset or --config")
    for s in args.set:
        cfg = _apply_override(cfg, s)

    if args.dump_config:
        print(to_json(cfg))
        return 0

    if args.bench:
        # the shared harness (engine/loop.time_frames, same as bench.py
        # and bench/suite.py): frames batched per dispatch, fetch-synced,
        # median-of-3 windows; honors --mesh and --frames-per-launch
        fb = max(args.frames_per_launch, 1) if args.frames_per_launch > 1 \
            else 48
        dt, stats = loop.time_frames(cfg, max(args.frames, 12), fb=fb,
                                     mesh=args.mesh)
        rays = cfg.render.width * cfg.render.height
        print(json.dumps({
            "frame_ms": round(dt * 1e3, 3),
            "fps": round(1.0 / dt, 1),
            "mrays_per_s": round(rays / dt / 1e6, 1),
            "frames_per_launch": fb,
            "mesh": args.mesh,
            "stats": {k: int(v) for k, v in stats.items()},
        }))
        return 0

    import jax
    os.makedirs(args.out, exist_ok=True)

    from volq.scene.state import build_camera, build_light

    if args.resume:
        # the checkpoint's cfg is authoritative (then re-overridden)
        state, cfg = checkpoint.load_state(args.resume)
        for s in args.set:
            cfg = _apply_override(cfg, s)
        camera = build_camera(cfg.camera, cfg.render.width,
                              cfg.render.height)
        light = build_light(cfg.light)
    else:
        state, camera, light = loop.setup(cfg)

    fpl = max(args.frames_per_launch, 1)
    if args.gif and fpl > 1:
        # batched launches only return the LAST frame of each dispatch —
        # a fpl>1 GIF would silently skip fpl-1 of every fpl frames
        print("note: --gif captures every frame; forcing "
              "--frames-per-launch 1", file=sys.stderr)
        fpl = 1
    if args.mesh:
        from volq.dist.mesh import make_mesh
        from volq.dist.sharded import sharded_frame_fn, shard_state
        mesh = make_mesh(args.mesh)
        state = shard_state(state, mesh)
        frs = {}

        def step(st, n):
            if n not in frs:
                frs[n] = sharded_frame_fn(cfg, mesh, n_frames_per_call=n)
            return frs[n](st, camera, light)
    else:
        lv = loop.cached_light_volumes(state, light, cfg)
        sb = loop.cached_slab_banks(state, lv, cfg)

        def step(st, n):
            if n == 1:
                return loop.frame(st, camera, light, cfg, lv, sb)
            st, image, stats = loop.frames(st, camera, light, cfg,
                                           lv, sb, n=n)
            return st, image, {k: v[-1] for k, v in stats.items()}

    profiler_cm = None
    if args.profile:
        import jax.profiler
        profiler_cm = jax.profiler.trace(args.profile)
        profiler_cm.__enter__()
    # exactly --frames sim frames: the LAST launch shrinks to the
    # remainder when fpl does not divide them (one extra compile)
    launches = [fpl] * (args.frames // fpl)
    if args.frames % fpl:
        launches.append(args.frames % fpl)

    cam_path = bool(args.dolly or args.orbit)
    if cam_path:
        import dataclasses
        import numpy as np

        def camera_at(frac):
            """Camera at path fraction ``frac``: yaw ``--orbit`` degrees
            around look_at, then pull ``--dolly`` of the eye->look_at
            distance (the camera pytree is a jit INPUT, so per-frame
            rebuilds re-upload 9 small leaves but never recompile).
            With --frames-per-launch > 1 the path steps once per launch."""
            cc = cfg.camera
            tgt = np.asarray(cc.look_at, np.float64)
            rel = np.asarray(cc.eye, np.float64) - tgt
            if args.orbit:
                th = np.deg2rad(args.orbit * frac)
                c, s = np.cos(th), np.sin(th)
                rel = np.array([c * rel[0] + s * rel[2], rel[1],
                                -s * rel[0] + c * rel[2]])
            rel = rel * (1.0 - args.dolly * frac)
            c2 = dataclasses.replace(cc, eye=tuple(tgt + rel))
            return build_camera(c2, cfg.render.width, cfg.render.height)
    gif_frames = []
    t_start = time.perf_counter()
    for i, n_launch in enumerate(launches):
        if cam_path:
            camera = camera_at(i / max(len(launches) - 1, 1))
        state, image, stats = step(state, n_launch)
        if args.png or not (args.npy or args.gif):
            io.save_png(os.path.join(args.out, f"frame_{i:04d}.png"),
                        io.tonemap(jax.device_get(image)))
        if args.npy:
            io.save_npy(os.path.join(args.out, f"frame_{i:04d}.npy"),
                        jax.device_get(image))
        if args.gif:
            gif_frames.append(io.downscale_u8(
                io.tonemap(jax.device_get(image)), args.gif_width))
        host = {k: int(v) for k, v in jax.device_get(stats).items()}
        print(f"frame {i}: " + " ".join(f"{k}={v}" for k, v in
                                        sorted(host.items())),
              file=sys.stderr)
    dt = time.perf_counter() - t_start
    print(f"{args.frames} frames in {dt:.2f}s "
          f"({args.frames / dt:.1f} fps incl. IO)", file=sys.stderr)
    if args.gif and gif_frames:
        io.save_gif(args.gif, gif_frames, fps=args.gif_fps)
        print(f"GIF ({len(gif_frames)} frames) written to {args.gif}",
              file=sys.stderr)

    if profiler_cm is not None:
        profiler_cm.__exit__(None, None, None)
        print(f"profiler trace written to {args.profile}", file=sys.stderr)

    if args.checkpoint:
        checkpoint.save_state(args.checkpoint, state, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
