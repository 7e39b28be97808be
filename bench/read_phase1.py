"""Digest the phase-1 device captures into one flip-decision table.

Parses bench/out/phase1_ab_*.log (flag_ab JSON lines) and
phase1_psnr_*.log (psnr_c3 "<variant> vs <ref>: X dB" lines) and
prints, per preset: variant, frame ms, delta vs base, PSNR, and a
recommendation — the fastest variant whose PSNR (vs the run's
reference image) clears --min-db (default 44; the repo's quality
ladder accepted 48.6 dB for c4's center-mode flip and ~43 dB for the
coarse CPU pre-gate at c3/c4 ratios, docs/DESIGN.md §5f-5g).

Usage: python bench/read_phase1.py [--min-db=44] [--phase=phase1]
(--phase=phase3 digests the phase-3 ladder's phase3_ab_*.log instead.)
Reads logs only — never touches a device; safe while the relay is down.
"""
import glob
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def load_ab(phase="phase1"):
    runs = {}
    # per-variant printed line, e.g. "c4   coarse+ilv:  6.123 ms  339.1
    # Mrays/s  band=[...]" — the salvage path for a run that crashed
    # before its closing JSON record (no stats available then)
    line_pat = re.compile(
        r"^(\w+)\s+(\S+):\s+([\d.]+) ms\s+([\d.]+) Mrays/s")
    for p in sorted(glob.glob(os.path.join(OUT, phase + "_ab_*.log"))):
        rec = None
        partial = {}
        preset = None
        for line in open(p):
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except ValueError:
                    pass
            else:
                m = line_pat.match(line)
                if m:
                    preset = m.group(1)
                    partial[m.group(2)] = {
                        "ms": float(m.group(3)),
                        "mrays": float(m.group(4)), "stats": {}}
        if rec is None and partial:
            rec = {"preset": preset, "variants": partial,
                   "partial": True}
        if rec:
            name = os.path.basename(p)[len(phase) + 1:-len(".log")]
            if rec.get("partial"):
                name += " (PARTIAL — crashed before JSON)"
            runs[name] = rec
    return runs


def load_psnr(phase="phase1"):
    """{preset: {variant: (db, ref)}} — prefers the rm0 (full-res march
    reference) comparison when both are printed."""
    out = {}
    pat = re.compile(r"^\s*(\S+) vs (\S+):\s*([\d.]+) dB")
    for p in sorted(glob.glob(os.path.join(OUT, phase + "_psnr_*.log"))):
        preset = os.path.basename(p)[len(phase) + 6:-len(".log")]
        d = out.setdefault(preset, {})
        for line in open(p):
            m = pat.match(line)
            if m:
                v, ref, db = m.group(1), m.group(2), float(m.group(3))
                if v not in d or ref == "rm0":
                    d[v] = (db, ref)
    return out


def main():
    min_db = next((float(a.split("=", 1)[1]) for a in sys.argv[1:]
                   if a.startswith("--min-db")), 44.0)
    phase = next((a.split("=", 1)[1] for a in sys.argv[1:]
                  if a.startswith("--phase")), "phase1")
    ab = load_ab(phase)
    psnr = load_psnr(phase)
    if not ab:
        print(f"no {phase}_ab_*.log captures under bench/out/ yet")
        return 1
    for run, rec in ab.items():
        preset = rec["preset"]
        vs = rec["variants"]
        base_ms = vs.get("base", vs.get("perstep", {})).get("ms")
        print(f"\n== {run} (preset {preset}; base {base_ms} ms; "
              f"PSNR floor {min_db} dB) ==")
        base_stats = vs.get("base", vs.get("perstep", {})).get("stats", {})
        best = None
        for name, r in vs.items():
            ms = r["ms"]
            delta = ("%+.1f%%" % (100.0 * (ms - base_ms) / base_ms)
                     if base_ms else "?")
            # gate a compound variant on its WORST measured part (each
            # part degrades independently); an exact-name PSNR row wins
            pd = psnr.get(preset, {})
            if name in pd:
                db_ref = pd[name]
            else:
                hits = [pd[part] for part in name.split("+")
                        if part in pd]
                db_ref = min(hits) if hits else None
            db_s = "%.1f dB vs %s" % db_ref if db_ref else "-"
            gate = (db_ref is None) or db_ref[0] >= min_db
            stats = r.get("stats", {})
            # veto only counters that REGRESS vs base: a preset may ship
            # a deliberate, PSNR-budgeted nonzero counter (c3's rect 144
            # overflows ~23/1024 by design — foot_p99 155.9), and that
            # must not block the base row or flag-neutral variants
            bad = {k: v for k, v in stats.items()
                   if v and v > base_stats.get(k, 0)
                   and ("overflow" in k or "clamp" in k
                        or k == "pair_inactive")}
            print(f"  {name:>22}: {ms:8.3f} ms  {delta:>7}  {db_s:>18}"
                  f"  {'OK' if gate else 'FAILS GATE'}"
                  f"{'  ' + str(bad) if bad else ''}")
            if gate and not bad and (best is None or ms < best[1]):
                best = (name, ms)
        if best:
            print(f"  -> recommend: {best[0]} ({best[1]:.3f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
