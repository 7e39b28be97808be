"""bench/read_phase1.py gates the round's preset flips; its PSNR
worst-part gating and loss-counter veto must be right."""
import os
import sys

sys.path.insert(0, os.path.join(
    __file__.rsplit("/tests/", 1)[0], "bench"))
import read_phase1 as rp  # noqa: E402


AB = ('{"preset": "c3", "variants": {'
      '"base": {"ms": 4.03, "mrays": 514.0, "band_ms": [4.0],'
      ' "stats": {"pair_inactive": 0}},'
      '"coarse+ilv": {"ms": 3.1, "mrays": 668.0, "band_ms": [3.0],'
      ' "stats": {}},'
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
    # bf16c passes PSNR but carries a nonzero loss counter -> not
    # recommended; coarse+ilv (slower but clean) wins
    assert "recommend: coarse+ilv (3.100 ms)" in out


def test_no_captures_yet(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(rp, "OUT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["read_phase1.py"])
    assert rp.main() == 1
    assert "no phase1_ab" in capsys.readouterr().out
