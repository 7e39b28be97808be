"""Deterministic replay (SURVEY.md section 5, failure-recovery story).

Every frame is a pure function of (config, base seed, frame index): the
sim is threefry-keyed by the frame counter and the bakes are pure, so any
frame can be reproduced in isolation — which is both the debugging story
("render exactly frame 1234") and the fault-recovery story (re-run from
nothing or from any checkpoint; tests assert bit-equality).
"""
from __future__ import annotations

import jax

from volq.engine.loop import setup, frame
from volq.scene.config import SceneConfig
from volq.sim.step import sim_step


def replay_frame(cfg: SceneConfig, frame_idx: int):
    """Recompute frame ``frame_idx`` (0-based: the image produced by the
    (frame_idx+1)-th call to engine.loop.frame) from scratch.
    Returns (state_after, image, stats)."""
    state, camera, light = setup(cfg)
    step = jax.jit(sim_step, static_argnames=("cfg",))
    for _ in range(frame_idx):
        state = step(state, cfg)
    # the sim portion of `frame` advances once more to frame_idx + 1
    return frame(state, camera, light, cfg)
