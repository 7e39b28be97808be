"""The sharded frame step (SURVEY.md section 2/5: the distributed path).

BASELINE config 5 renders 4K with ray tiles sharded across a v5e-8 mesh.
One shard_map program per frame over a 1-D mesh:

  * sim: particle slots sharded (DP over particles); emission ranks are
    globalized with a prefix over shards (sim/step.py), and per-slot
    counter PRNG keeps results bit-identical to single-chip;
  * animated volume re-bake: bank entries sharded over the mesh, then
    all_gather (bandwidth: the bank is small; the bake is VPU-heavy);
  * particle state all_gather (~1 MB at 16k particles — rides ICI);
  * render: contiguous flat-tile ranges per shard, fully independent —
    pure data parallelism over rays, no collective in the hot loop;
  * stats: psum/pmax reductions.

The image is returned as sharded flat tiles; assembly to [H, W, 4] happens
in the enclosing jit (a layout shuffle XLA handles).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from volq.core.types import Particles, SceneState
from volq.dist.mesh import AXIS
from volq.render import render_frame_tiles, assemble_image
from volq.render.warp import render_warp_canvas, _canvas_finish
from volq.scene.config import SceneConfig
from volq.sim.step import sim_step
from volq.volume.bake import bake_bank_4d
from volq.volume.lightbake import bake_light_volumes, dominant_axis


def _cdiv(a, b):
    return -(-a // b)


def _over(front, back):
    """Associative OVER of packed canvases [4, h, w] (C premult, T)."""
    C = front[:3] + front[3:4] * back[:3]
    T = front[3:4] * back[3:4]
    return jnp.concatenate([C, T], axis=0)


def _binary_swap(canvas, idx, n_shards: int, bf16_wire: bool = False):
    """Binary-swap parallel compositing: each shard enters with the
    canvas of ITS depth slice (full frame) and leaves with its
    1/n_shards contiguous ROW RANGE of the fully composited canvas.
    log2(n) rounds; each round exchanges half the current region with
    the partner across one index bit and OVER-combines (the lower index
    holds the NEARER depth slice, hence the front).

    ``bf16_wire`` ships every ppermute payload as bf16 (the OVER still
    accumulates fp32 on arrival), halving the per-chip ICI combine
    bytes; it quantizes what rides the wire, so sharded==single-chip
    becomes a PSNR-gated property instead of bit-exact (the
    warp_swap_bf16 flag's contract; docs/DESIGN.md 5h#3)."""
    _, Hc, Wc = canvas.shape

    def _ship(x, perm):
        if bf16_wire:
            return jax.lax.ppermute(
                x.astype(jnp.bfloat16), AXIS, perm=perm).astype(x.dtype)
        return jax.lax.ppermute(x, AXIS, perm=perm)
    nr = n_shards.bit_length() - 1
    Hp = _cdiv(Hc, n_shards) * n_shards
    if Hp != Hc:
        pad = jnp.concatenate(
            [jnp.zeros((3, Hp - Hc, Wc), canvas.dtype),
             jnp.ones((1, Hp - Hc, Wc), canvas.dtype)], axis=0)
        canvas = jnp.concatenate([canvas, pad], axis=1)
    region = canvas

    # OVER is associative but NOT commutative: round r must merge
    # depth-ADJACENT groups, i.e. partners differ in bit r (masks
    # ascending).  The kept row half is forced to the same bit, so the
    # final ownership is bit-REVERSED in the shard index — the closing
    # ppermute (bit reversal is an involution) restores natural order.
    for rnd in range(nr):
        mask = 1 << rnd
        size = region.shape[1] // 2
        first = region[:, :size]
        second = region[:, size:2 * size]
        bit = (idx >> rnd) & 1
        am_first = (bit == 0)
        keep = jnp.where(am_first, first, second)
        send = jnp.where(am_first, second, first)
        recv = _ship(send, [(i, i ^ mask) for i in range(n_shards)])
        front = jnp.where(am_first, keep, recv)
        back = jnp.where(am_first, recv, keep)
        region = _over(front, back)

    def bitrev(x):
        return int(format(x, f"0{nr}b")[::-1], 2) if nr else x

    return _ship(region, [(i, bitrev(i)) for i in range(n_shards)])


def state_specs(sharded_particles: bool):
    pspec = P(AXIS) if sharded_particles else P()
    return SceneState(
        particles=Particles(pos=pspec, vel=pspec, age=pspec, lifetime=pspec,
                            size=pspec, albedo=pspec, vol_idx=pspec),
        volumes=P(), frame=P(), spawn_carry=P(), time=P(), base_key=P(),
    )


def shard_state(state: SceneState, mesh) -> SceneState:
    """Place a host/single-device state onto the mesh: particle axis
    sharded, everything else replicated."""
    specs = state_specs(sharded_particles=True)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def sharded_frame_fn(cfg: SceneConfig, mesh, n_frames_per_call: int = 1):
    """Build the jitted sharded frame step for (cfg, mesh).

    Returns f(state, camera, light) -> (state', image [H,W,4], stats) with
    state sharded as in shard_state. N particles and the volume bank size
    must divide the mesh size (validated here).

    ``n_frames_per_call`` advances that many frames per device dispatch
    (lax.scan over the shard body, bit-identical to repeated calls —
    the sharded twin of engine/loop.frames); the LAST frame's image and
    stats are returned.
    """
    n_shards = mesh.devices.size
    r = cfg.render
    n_tiles = (r.width // r.tile_w) * (r.height // r.tile_h)
    tiles_local = _cdiv(n_tiles, n_shards)
    warp = r.engine == "warp"
    if cfg.n_particles % n_shards:
        raise ValueError(f"n_particles {cfg.n_particles} must divide by "
                         f"mesh size {n_shards}")
    if warp and (n_shards & (n_shards - 1)):
        raise ValueError(f"warp engine: mesh size {n_shards} must be a "
                         "power of two (binary-swap compositing)")
    if warp and not r.warp_canvas_fp32:
        raise ValueError("warp engine: the sharded binary-swap combine "
                         "requires warp_canvas_fp32=True")
    v = cfg.volume
    bake_sharded = v.animated and v.bank_size % n_shards == 0

    def shard_body(state: SceneState, camera, light):
        state = sim_step(state, cfg, axis_name=AXIS)
        idx = jax.lax.axis_index(AXIS)

        volumes = state.volumes
        if v.animated:
            if bake_sharded:
                local_m = v.bank_size // n_shards
                ids = idx * local_m + jnp.arange(local_m, dtype=jnp.int32)
                local = bake_bank_4d(
                    v.bank_size, v.size, v.seed, state.time,
                    octaves=v.octaves, noise_scale=v.noise_scale,
                    time_scale=v.time_scale, cutoff=v.cutoff, edge=v.edge,
                    ids=ids)
                volumes = jax.lax.all_gather(local, AXIS, axis=0,
                                             tiled=True)
            else:
                volumes = bake_bank_4d(
                    v.bank_size, v.size, v.seed, state.time,
                    octaves=v.octaves, noise_scale=v.noise_scale,
                    time_scale=v.time_scale, cutoff=v.cutoff, edge=v.edge)
        state = state._replace(volumes=volumes)

        # Replicate the freshly-stepped particle state for binning/render.
        parts_full = jax.tree.map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True),
            state.particles)

        light_volumes = None
        if (cfg.render.engine in ("slab", "warp")
                and cfg.render.light_steps > 0):
            light_volumes = bake_light_volumes(
                volumes, jnp.asarray(light.direction, jnp.float32),
                axis=dominant_axis(cfg.light.direction))

        if warp:
            # Warp-engine distribution = classic BINARY-SWAP parallel
            # compositing, TPU-reborn: shard the (replicated, globally
            # depth-sorted) particle list into contiguous DEPTH SLICES —
            # each shard marches + composites only N/n_shards particles
            # over the full frame — then OVER-combine the canvases over
            # ICI in log2(n) ppermute rounds, halving the owned row range
            # each round.  OVER is associative, so the result equals the
            # single-chip sequential composite (fp32 canvas required).
            z = jnp.where(parts_full.age < parts_full.lifetime,
                          (parts_full.pos - camera.eye) @ camera.fwd,
                          jnp.inf)
            order = jnp.argsort(z, stable=True).astype(jnp.int32)
            n_p = cfg.n_particles // n_shards
            ids = jax.lax.dynamic_slice(order, (idx * n_p,), (n_p,))
            parts_k = jax.tree.map(lambda a: a[ids], parts_full)
            canvas, stats = render_warp_canvas(
                parts_k, volumes, camera, light, cfg,
                light_volumes=light_volumes)
            # Crop the rect padding BEFORE the swap: OVER is pixel-wise,
            # so combining cropped canvases equals cropping the combined
            # one — and the [4, H, W] region is ~25% smaller than the
            # padded canvas at c5 (132.7 vs 177.4 MB fp32), cutting both
            # the per-chip ICI bytes (exactly one canvas/frame rides the
            # wire, bench/combine_model.py) and the OVER arithmetic.
            from volq.render.kernel import canvas_geom
            g = canvas_geom(cfg, r.height)
            canvas = jax.lax.dynamic_slice(
                canvas, (0, g.pad, g.pad), (4, g.hc_img, g.wc_img))
            tiles = _binary_swap(canvas, idx, n_shards,
                                 bf16_wire=bool(r.warp_swap_bf16))
        else:
            tile_start = idx * tiles_local
            tiles, stats = render_frame_tiles(
                parts_full, volumes, camera, light, cfg,
                tile_start=tile_start, n_tiles_local=tiles_local,
                light_volumes=light_volumes)
        # Warp stats are computed per DISJOINT depth slice: all additive,
        # psum everything.  Tile engines compute "alive" etc. from the
        # replicated particle state (identical on every shard): pmax is
        # the identity for those.
        replicated = set() if warp else {
            "alive", "mt_overflow", "max_pairs_per_tile_seen"}
        stats = {
            k: (jax.lax.pmax(v_, AXIS) if k in replicated
                else jax.lax.psum(v_, AXIS))
            for k, v_ in stats.items()
        }
        return state, tiles, stats

    in_specs = (state_specs(True), P(), P())
    out_specs = (state_specs(True),
                 P(None, AXIS, None) if warp else P(AXIS),
                 P())
    body = jax.shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

    @jax.jit
    def frame(state, camera, light):
        state, tiles, stats = body(state, camera, light)
        if n_frames_per_call > 1:
            def sc(carry, _):
                st, _tiles = carry
                st, t, s = body(st, camera, light)
                return (st, t), s

            (state, tiles), stats_all = jax.lax.scan(
                sc, (state, tiles), None, length=n_frames_per_call - 1)
            stats = jax.tree.map(lambda a: a[-1], stats_all)
        if warp:
            image = _canvas_finish(tiles[:3], tiles[3], cfg, r.height,
                                   cropped=True)
        else:
            image = assemble_image(tiles, cfg)
        return state, image, stats

    return frame
