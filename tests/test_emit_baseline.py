"""bench/emit_baseline.py is the one writer of BASELINE.md's measured
sections; its marker surgery and table generation must round-trip."""
import json
import os
import sys

sys.path.insert(0, os.path.join(
    __file__.rsplit("/tests/", 1)[0], "bench"))
import emit_baseline as eb  # noqa: E402


SUITE = [
    {"config": "c3", "resolution": "1920x1080", "particles": 1024,
     "frame_ms": 4.03, "mrays_per_s": 514.5,
     "window_mrays": [509.0, 514.5, 520.1],
     "engine_flags": {"engine": "warp", "rect": 144, "rm": 96, "vx": 64,
                      "pair": 0, "fused": 1, "dtype": "bf16"},
     "stats": {"alive": 1024, "rect_overflow": 0, "shift_clamped": 0}},
    {"config": "c5shard", "frame_ms": 16.0, "mrays_per_chip_s": 515.0,
     "window_mrays": [511.3, 515.0, 518.2],
     "engine_flags": {"engine": "warp", "rect": 176, "rm": 80, "vx": 64,
                      "pair": 1, "fused": 1, "dtype": "bf16",
                      "light": "center"},
     "stats": {"rect_overflow": 2}},
]
DIFFS = [
    {"case": "c1_exact_full", "platform": "axon", "max_abs_diff": 2.1e-5,
     "budget": 1e-3, "pass": True},
    {"case": "c3class_warp_pallas_bf16_vx64_1080p", "platform": "axon",
     "max_abs_diff": 9e-3, "budget": 4 / 256.0, "pass": True},
]
ROOFLINE = [
    {"config": "c4", "paired": True, "resident_bank": True,
     "layout": {"coarse": True, "ilv": True},
     "bytes": {"slab": 2.1e7, "window": 5.1e8, "canvas": 7.7e7,
               "total": 6.4e8},
     "flops_T": 0.223, "floor_ms": {"mxu": 1.75, "hbm": 1.07,
                                    "max": 1.75},
     "measured_ms": 5.91, "x_of_floor": 3.38,
     "wide_frac": 0.031, "window_dims": [80, 384, 128]},
]
CALIB = {"mxu_tflops": 125.8, "hbm_gbps": 611.2}


def test_emit_rewrites_marked_sections(tmp_path, monkeypatch):
    md = tmp_path / "BASELINE.md"
    md.write_text("# head\n<!-- MEASURED:BEGIN -->\nOLD A\n"
                  "<!-- MEASURED:END -->\nmiddle prose\n"
                  "<!-- DEVICE_DIFF:BEGIN -->\nOLD B\n"
                  "<!-- DEVICE_DIFF:END -->\n"
                  "<!-- ROOFLINE:BEGIN -->\nOLD C\n"
                  "<!-- ROOFLINE:END -->\ntail\n")
    out = tmp_path / "out"
    out.mkdir()
    suite = SUITE + [dict(SUITE[0], config="c4:perstep",
                          mrays_per_s=104.1)]
    (out / "suite.json").write_text(json.dumps(suite))
    (out / "device_diff.json").write_text(json.dumps(DIFFS))
    (out / "roofline.json").write_text(json.dumps(ROOFLINE))
    # the calibration is a COMMITTED artifact since round 5 — the
    # emitter reads it from the ladders dir beside OUT, not from the
    # gitignored out/ (VERDICT r4 "commit calib.json")
    ladders = tmp_path / "ladders"
    ladders.mkdir()
    (ladders / "calib.json").write_text(json.dumps(CALIB))
    (out / "bench.json").write_text(json.dumps(
        {"metric": "x", "value": 514.5, "unit": "Mrays/s",
         "vs_baseline": 1.029, "window_mrays": [509.0, 514.5, 520.1]}))
    monkeypatch.setattr(eb, "BASELINE", str(md))
    monkeypatch.setattr(eb, "OUT", str(out))
    eb.main()
    text = md.read_text()
    assert "OLD A" not in text and "OLD B" not in text
    assert "middle prose" in text and "tail" in text       # surgery only
    assert "| c3 |" in text and "**514.5**" in text
    assert "509.0..520.1" in text                          # window band
    assert "511.3..518.2" in text                          # c5 /chip band
    assert "vx 64" in text and "paired" in text            # engine flags
    assert "rect_overflow=2" in text                       # nonzero stat
    assert "shift_clamped" not in text.split("DEVICE_DIFF")[0] \
        or "all counted losses 0" in text                  # zeros filtered
    assert "c3class_warp_pallas_bf16_vx64_1080p" in text
    assert "vs_baseline 1.029" in text
    assert "OLD C" not in text                             # roofline row
    assert "1.75 / 1.07" in text and "3.38" in text
    assert "MXU 126 TFLOPs" in text                        # calib used
    assert "`perstep` variant" in text                     # variant row
    # idempotent: emitting again over its own output still works
    eb.main()
    assert md.read_text().count("| c3 |") == 1


def test_missing_markers_skip_not_crash(tmp_path, monkeypatch, capsys):
    """phase 2 runs ONE emit at the very end; a garbled marker must cost
    that section only, never the whole regeneration."""
    md = tmp_path / "B.md"
    md.write_text("<!-- MEASURED:BEGIN -->x<!-- MEASURED:END -->\n"
                  "no roofline markers here\n")
    out = tmp_path / "o"
    out.mkdir()
    (out / "suite.json").write_text(json.dumps(SUITE))
    (out / "roofline.json").write_text(json.dumps(ROOFLINE))
    monkeypatch.setattr(eb, "BASELINE", str(md))
    monkeypatch.setattr(eb, "OUT", str(out))
    eb.main()                                   # must not raise
    text = md.read_text()
    assert "**514.5**" in text                  # measured still emitted
    assert "no roofline markers here" in text   # untouched


def test_zero_stats_render_as_clean(tmp_path, monkeypatch):
    md = tmp_path / "B.md"
    md.write_text("<!-- MEASURED:BEGIN -->x<!-- MEASURED:END -->\n")
    out = tmp_path / "o"
    out.mkdir()
    suite = [dict(SUITE[0], stats={"alive": 7, "straddled": 3})]
    (out / "suite.json").write_text(json.dumps(suite))
    monkeypatch.setattr(eb, "BASELINE", str(md))
    monkeypatch.setattr(eb, "OUT", str(out))
    eb.main()
    assert "all counted losses 0" in md.read_text()
