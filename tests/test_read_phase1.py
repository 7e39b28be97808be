"""bench/read_phase1.py gates the round's preset flips; its PSNR
worst-part gating and loss-counter veto must be right."""
import os
import sys

sys.path.insert(0, os.path.join(
    __file__.rsplit("/tests/", 1)[0], "bench"))
import read_phase1 as rp  # noqa: E402


AB = ('{"preset": "c3", "variants": {'
      '"base": {"ms": 4.03, "mrays": 514.0, "band_ms": [4.0],'
      ' "stats": {"pair_inactive": 0, "rect_overflow": 23}},'
      '"coarse+ilv": {"ms": 3.1, "mrays": 668.0, "band_ms": [3.0],'
      ' "stats": {"rect_overflow": 23}},'
      '"coarse+ilv+vx48": {"ms": 2.9, "mrays": 714.0, "band_ms": [2.8],'
      ' "stats": {}},'
      '"coarse+ilv+bf16c": {"ms": 2.95, "mrays": 702.0,'
      ' "band_ms": [2.9], "stats": {"shift_clamped": 4}}}}')
PSNR = """preset c3; reference = rm0; base stats: {}
    base vs rm0:  52.10 dB
  coarse vs rm0:  46.30 dB
    vx48 vs rm0:  41.20 dB
   bf16c vs rm0:  49.00 dB
"""


def test_worst_part_gate_and_counter_veto(tmp_path, monkeypatch, capsys):
    (tmp_path / "phase1_ab_c3.log").write_text("noise\n" + AB + "\n")
    (tmp_path / "phase1_psnr_c3.log").write_text(PSNR)
    monkeypatch.setattr(rp, "OUT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["read_phase1.py"])
    assert rp.main() == 0
    out = capsys.readouterr().out
    # vx48's 41.2 dB (its WORST part) fails the 44 dB floor even though
    # 'coarse' alone would pass
    assert "FAILS GATE" in out
    vx_line = next(ln for ln in out.splitlines()
                   if "coarse+ilv+vx48" in ln)
    assert "41.2" in vx_line and "FAILS GATE" in vx_line
    # bf16c passes PSNR but REGRESSES a loss counter vs base -> not
    # recommended; coarse+ilv wins even though it carries base's own
    # deliberate rect_overflow (counters veto only on regression: a
    # preset may ship a PSNR-budgeted nonzero counter, like c3's
    # rect-144 overflow)
    assert "recommend: coarse+ilv (3.100 ms)" in out


def test_salvages_partial_log_without_json(tmp_path, monkeypatch, capsys):
    """A flag_ab run that crashed before its closing JSON record (the
    paired-coarse Mosaic failure mode) still digests from the printed
    per-variant lines."""
    (tmp_path / "phase1_ab_c9.log").write_text(
        "c9             base:   8.000 ms   100.0 Mrays/s  band=['8.0']\n"
        "c9              ilv:   7.000 ms   114.0 Mrays/s  band=['7.0']\n"
        "Traceback (most recent call last):\n  boom\n")
    monkeypatch.setattr(rp, "OUT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["read_phase1.py"])
    assert rp.main() == 0
    out = capsys.readouterr().out
    assert "PARTIAL" in out and "recommend: ilv (7.000 ms)" in out


def test_no_captures_yet(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(rp, "OUT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["read_phase1.py"])
    assert rp.main() == 1
    assert "no phase1_ab" in capsys.readouterr().out
