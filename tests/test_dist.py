"""Distributed tests (SURVEY.md section 4 'multi-chip without a cluster'):
the shard_map frame on an 8-virtual-device CPU mesh must match the
single-device frame bit-for-bit-ish (same math, different partitioning) —
the identical code path runs on a real v5e-8."""
import dataclasses

import pytest

import numpy as np
import jax

from volq.dist.mesh import make_mesh
from volq.dist.sharded import sharded_frame_fn, shard_state
from volq.engine.loop import setup, frame
from volq.scene.config import VolumeConfig, EmitterConfig

TOL = 1e-5


def _compare_sharded(cfg, n_frames=3):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    state, camera, light = setup(cfg)
    # independent state for the sharded run: engine.loop.frame DONATES its
    # state, and on the CPU backend device_put replication may alias the
    # same host buffer, so sharing one initial state would leave sh_state
    # pointing at donated (deleted) storage
    sh_state = shard_state(setup(cfg)[0], mesh)
    sh_frame = sharded_frame_fn(cfg, mesh)

    for _ in range(n_frames):
        state, img_1, st_1 = frame(state, camera, light, cfg)
        sh_state, img_8, st_8 = sh_frame(sh_state, camera, light)

    assert np.abs(np.asarray(img_1, np.float64)
                  - np.asarray(img_8, np.float64)).max() < TOL
    # particle state identical across the two partitionings
    for a, b in zip(jax.tree.leaves(state.particles),
                    jax.tree.leaves(sh_state.particles)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), atol=1e-6)
    # NOTE: band-local diagnostics like the warp engine's "rendered" are
    # psum'd over shards and legitimately over-count particles visible in
    # several bands — only partition-independent stats compare exactly.
    if "pairs_kept" in st_1:
        assert int(st_1["pairs_kept"]) == int(st_8["pairs_kept"])
    assert int(st_1["alive"]) == int(st_8["alive"])
    return st_8


@pytest.mark.slow
def test_sharded_frame_matches_single_device(tiny_cfg):
    cfg = dataclasses.replace(
        tiny_cfg, n_particles=16,
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=30.0,
                                    life_min=0.4, life_max=0.8))
    _compare_sharded(cfg)


def test_sharded_animated_rebake(tiny_cfg):
    cfg = dataclasses.replace(
        tiny_cfg, n_particles=16,
        volume=VolumeConfig(size=8, bank_size=8, octaves=1, animated=True),
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=30.0))
    _compare_sharded(cfg, n_frames=2)


def test_sharded_warp_binary_swap_matches_single_device(tiny_cfg):
    """The warp engine distributes via depth-sliced binary-swap
    compositing (each shard marches only its depth slice; canvases
    OVER-combine across ICI): the sharded frame must match single-chip,
    including lighting (baked light volumes replicated) and emission."""
    cfg = dataclasses.replace(
        tiny_cfg, n_particles=16,
        render=dataclasses.replace(tiny_cfg.render, engine="warp",
                                   warp_rect=48, warp_chunk=4,
                                   light_steps=4),
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=30.0,
                                    life_min=0.4, life_max=0.8))
    _compare_sharded(cfg)


def test_sharded_emission_matches_global_order(tiny_cfg):
    # emission-heavy: most slots dead, spawn budget crosses shard boundaries
    cfg = dataclasses.replace(
        tiny_cfg, n_particles=32, init="empty",
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=150.0,
                                    life_min=0.2, life_max=0.3))
    _compare_sharded(cfg, n_frames=5)


def test_sharded_swap_bf16_wire(tiny_cfg):
    """warp_swap_bf16 ships the binary-swap ppermute payloads as bf16
    (DESIGN 5h#3): the wire bytes halve — asserted on the traced jaxpr's
    ppermute operand dtypes — and the sharded frame stays within a bf16
    quantization band of single-chip (PSNR property, not bit-exact)."""
    cfg = dataclasses.replace(
        tiny_cfg, n_particles=16,
        render=dataclasses.replace(tiny_cfg.render, engine="warp",
                                   warp_rect=48, warp_chunk=4,
                                   light_steps=4, warp_swap_bf16=1),
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=30.0,
                                    life_min=0.4, life_max=0.8))
    mesh = make_mesh(8)
    state, camera, light = setup(cfg)
    sh_state = shard_state(setup(cfg)[0], mesh)
    sh_frame = sharded_frame_fn(cfg, mesh)
    for _ in range(2):
        state, img_1, _ = frame(state, camera, light, cfg)
        sh_state, img_8, _ = sh_frame(sh_state, camera, light)
    a = np.asarray(img_1, np.float64)
    b = np.asarray(img_8, np.float64)
    mse = np.mean((a - b) ** 2)
    psnr = 10 * np.log10(a.max() ** 2 / mse) if mse else np.inf
    assert psnr >= 40.0, f"bf16 wire PSNR {psnr:.1f} dB"
    # the payload really is bf16 on the wire (half the fp32 bytes)
    from jax.sharding import PartitionSpec as P
    from volq.dist.mesh import AXIS
    from volq.dist.sharded import _binary_swap

    def body(canvas):
        idx = jax.lax.axis_index(AXIS)
        return _binary_swap(canvas, idx, 8, bf16_wire=True)

    f = jax.shard_map(body, mesh=mesh, in_specs=P(), out_specs=P(AXIS),
                      check_vma=False)
    jaxpr = jax.make_jaxpr(f)(
        jax.ShapeDtypeStruct((4, 64, 32), np.float32))
    seen = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "ppermute":
                seen.append(eqn.invars[0].aval.dtype)
            for sub in eqn.params.values():
                if hasattr(sub, "eqns"):
                    walk(sub)
                elif hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)

    walk(jaxpr.jaxpr)
    assert seen and all(d == jax.numpy.bfloat16 for d in seen), seen


@pytest.mark.slow
def test_sharded_coarse_interleave_matches_single_device(tiny_cfg):
    """The round-4 canvas layouts ride the binary swap: in coarse mode
    each shard's canvas is march-cell resolution (the pre-swap crop and
    the ICI bytes shrink by ~ratio^2) and the bilinear cell->pixel
    upsample runs once per chip after the merge; interleaved canvases
    are de-interleaved before the swap.  Sharded must still match the
    single-device frame."""
    cfg = dataclasses.replace(
        tiny_cfg, n_particles=16,
        render=dataclasses.replace(tiny_cfg.render, engine="warp",
                                   warp_pallas=True, warp_fused=True,
                                   warp_rect=48, warp_march_rect=32,
                                   warp_chunk=4, warp_shift_max=8,
                                   warp_coarse=1, warp_interleave=1),
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=30.0,
                                    life_min=0.4, life_max=0.8))
    _compare_sharded(cfg)
