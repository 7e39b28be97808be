from volq.engine.loop import frame, render_only, setup, run, time_frames
from volq.engine.checkpoint import save_state, load_state
from volq.engine.io import save_png, save_npy, tonemap

__all__ = ["frame", "render_only", "setup", "run", "time_frames",
           "save_state", "load_state", "save_png", "save_npy", "tonemap"]
