"""Engine tests: frame loop, checkpoint/resume exactness, IO, config JSON."""
import dataclasses
import os
import struct
import zlib

import numpy as np
import jax

from volq.engine.loop import run, setup, frame
from volq.engine.checkpoint import save_state, load_state
from volq.engine.io import save_png, tonemap
from volq.scene.config import to_json, from_json, c1, c2, c3, c4, c5


def test_run_loop(tiny_cfg):
    cfg = dataclasses.replace(
        tiny_cfg,
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=20.0))
    state, images, stats = run(cfg, 3)
    assert len(images) == 3 and len(stats) == 3
    assert images[0].shape == (cfg.render.height, cfg.render.width, 4)
    assert int(state.frame) == 3
    assert all("pairs_kept" in s for s in stats)


def test_frames_scan_matches_single_frames(tiny_cfg):
    """engine.loop.frames (n frames per device dispatch, lax.scan) must
    be BIT-IDENTICAL to n sequential frame() calls — it is an execution
    strategy, not a semantics change."""
    from volq.engine.loop import frames
    cfg = dataclasses.replace(
        tiny_cfg,
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=20.0))
    state0, camera, light = setup(cfg)
    sa = jax.tree.map(lambda a: a.copy(), state0)
    sb = jax.tree.map(lambda a: a.copy(), state0)
    for _ in range(3):
        sa, img_a, stats_a = frame(sa, camera, light, cfg)
    sb, img_b, stats_b = frames(sb, camera, light, cfg, n=3)
    assert np.array_equal(np.asarray(img_a), np.asarray(img_b))
    for la, lb in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
    # stats come back stacked [n]
    assert int(stats_b["alive"].shape[0]) == 3
    assert int(stats_a["alive"]) == int(stats_b["alive"][-1])


def test_checkpoint_resume_is_frame_exact(tiny_cfg, tmp_path):
    cfg = dataclasses.replace(
        tiny_cfg,
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=25.0,
                                    life_min=0.3, life_max=0.6))
    state, camera, light = setup(cfg)
    for _ in range(3):
        state, img, _ = frame(state, camera, light, cfg)

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, cfg)
    restored, cfg2 = load_state(path)
    assert cfg2 == cfg

    for _ in range(3):
        state, img_a, _ = frame(state, camera, light, cfg)
        restored, img_b, _ = frame(restored, camera, light, cfg2)
    assert np.array_equal(np.asarray(img_a), np.asarray(img_b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_png_writer(tmp_path):
    rgba = np.zeros((8, 16, 4), np.float32)
    rgba[..., 0] = 0.5
    rgba[..., 3] = 1.0
    path = str(tmp_path / "x.png")
    save_png(path, tonemap(rgba))
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # decode the IDAT chunk and check dimensions from IHDR
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (16, 8)
    idat_start = raw.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", raw[raw.index(b"IDAT") - 4:
                                       raw.index(b"IDAT")])[0]
    decoded = zlib.decompress(raw[idat_start:idat_start + idat_len])
    assert len(decoded) == h * (1 + w * 4)


def test_replay_frame_is_bit_exact(tiny_cfg):
    from volq.engine.replay import replay_frame
    cfg = dataclasses.replace(
        tiny_cfg,
        emitter=dataclasses.replace(tiny_cfg.emitter, rate=25.0,
                                    life_min=0.3, life_max=0.6))
    state, camera, light = setup(cfg)
    imgs = []
    for _ in range(4):
        state, img, _ = frame(state, camera, light, cfg)
        imgs.append(np.asarray(img))
    _, img_r, _ = replay_frame(cfg, 3)
    assert np.array_equal(np.asarray(img_r), imgs[3])
    _, img_r0, _ = replay_frame(cfg, 0)
    assert np.array_equal(np.asarray(img_r0), imgs[0])


def test_config_json_roundtrip():
    for preset in (c1, c2, c3, c4, c5):
        cfg = preset()
        assert from_json(to_json(cfg)) == cfg


def test_presets_validate():
    for preset in (c1, c2, c3, c4, c5):
        cfg = preset()
        r = cfg.render
        assert r.width % r.tile_w == 0 and r.height % r.tile_h == 0
