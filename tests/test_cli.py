"""CLI smoke tests (the user surface), including the mesh path on the
8-virtual-device CPU backend (VERDICT round-1 item 9)."""
import json
import os

import numpy as np

from volq.cli import main


_SHRINK = ["--set", "render.width=128", "--set", "render.height=64",
           "--set", "render.steps=8", "--set", "volume.size=16",
           "--set", "n_particles=8", "--set", "init=grid",
           "--set", "emitter.size_min=0.4", "--set", "emitter.size_max=0.7"]


def test_cli_mesh_smoke(tmp_path):
    out = tmp_path / "mesh_out"
    rc = main(["--preset", "c1", "--frames", "2", "--mesh", "8",
               "--out", str(out), "--npy"] + _SHRINK)
    assert rc == 0
    a = np.load(out / "frame_0001.npy")
    assert a.shape == (64, 128, 4)
    assert a[..., 3].max() > 0.05


def test_cli_mesh_matches_single(tmp_path):
    """The sharded CLI path must produce the same frames as single-chip."""
    out1 = tmp_path / "single"
    out8 = tmp_path / "mesh"
    main(["--preset", "c1", "--frames", "1", "--out", str(out1), "--npy"]
         + _SHRINK)
    main(["--preset", "c1", "--frames", "1", "--mesh", "8",
          "--out", str(out8), "--npy"] + _SHRINK)
    a = np.load(out1 / "frame_0000.npy")
    b = np.load(out8 / "frame_0000.npy")
    assert np.abs(a - b).max() < 1e-6


def test_cli_mesh_resume(tmp_path):
    """--mesh with --resume: mesh built from the checkpoint's cfg."""
    out = tmp_path / "o"
    ck = tmp_path / "ck.npz"
    main(["--preset", "c1", "--frames", "1", "--out", str(out), "--npy",
          "--checkpoint", str(ck)] + _SHRINK)
    rc = main(["--resume", str(ck), "--preset", "c1", "--frames", "1",
               "--mesh", "8", "--out", str(out), "--npy"] + _SHRINK)
    assert rc == 0


def test_cli_frames_per_launch(tmp_path):
    """--frames-per-launch batches frames per dispatch; the saved (every
    Nth) frames must match the one-frame-per-launch run exactly."""
    out1 = tmp_path / "one"
    outn = tmp_path / "batched"
    main(["--preset", "c1", "--frames", "4", "--out", str(out1), "--npy"]
         + _SHRINK)
    rc = main(["--preset", "c1", "--frames", "4", "--frames-per-launch",
               "2", "--out", str(outn), "--npy"] + _SHRINK)
    assert rc == 0
    a = np.load(out1 / "frame_0003.npy")   # 4th frame
    b = np.load(outn / "frame_0001.npy")   # 2nd launch = frames 3-4
    assert np.array_equal(a, b)


def test_cli_warp_engine(tmp_path):
    out = tmp_path / "warp"
    rc = main(["--preset", "c1", "--frames", "1", "--out", str(out),
               "--npy", "--set", "render.engine=warp",
               "--set", "render.warp_rect=96"] + _SHRINK)
    assert rc == 0
    a = np.load(out / "frame_0000.npy")
    assert a[..., 3].max() > 0.05


def test_cli_dump_config(capsys):
    rc = main(["--preset", "c2", "--dump-config"])
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["n_particles"] == 64


def test_cli_gif_captures_every_frame(tmp_path, capsys):
    """--gif with --frames-per-launch > 1: batched launches only return
    the LAST frame of each dispatch, so the CLI must force fpl=1 (with a
    note) — the GIF gets ALL --frames frames, not every fpl-th.  The
    camera orbits so frames differ (PIL merges identical consecutive
    frames into one longer-duration frame, which would mask the count)."""
    gif = tmp_path / "anim.gif"
    rc = main(["--preset", "c1", "--frames", "3", "--frames-per-launch",
               "2", "--gif", str(gif), "--gif-width", "64", "--orbit",
               "90", "--out", str(tmp_path / "g")] + _SHRINK)
    assert rc == 0
    from PIL import Image
    with Image.open(gif) as im:
        assert getattr(im, "n_frames", 1) == 3


def test_cli_camera_path(tmp_path):
    """--dolly/--orbit animate the camera across the run: the final
    frame must differ from the first (the scene is static otherwise,
    c1 life >> run), and a path-free run must be unchanged frame to
    frame."""
    out = tmp_path / "fly"
    rc = main(["--preset", "c1", "--frames", "3", "--dolly", "0.5",
               "--orbit", "60", "--out", str(out), "--npy"] + _SHRINK)
    assert rc == 0
    a = np.load(out / "frame_0000.npy")
    b = np.load(out / "frame_0002.npy")
    assert a[..., 3].max() > 0.05
    assert np.abs(a - b).max() > 1e-3

    out2 = tmp_path / "static"
    main(["--preset", "c1", "--frames", "2", "--out", str(out2),
          "--npy"] + _SHRINK)
    s0 = np.load(out2 / "frame_0000.npy")
    s1 = np.load(out2 / "frame_0001.npy")
    assert np.array_equal(s0, s1)
