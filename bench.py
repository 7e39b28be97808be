"""Headline benchmark: ray throughput on BASELINE config 3
(1k advected particles, per-particle 128^3 volumes, 1080p render loop).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/500}
where the baseline is the driver target of 500 Mrays/s per v5e chip
(BASELINE.md; the reference publishes no numbers of its own).

The measured quantity is the full frame step (sim + march + composite)
in steady state with the image kept on device — pixels/sec/1e6.  The
harness is engine/loop.time_frames (shared with bench/suite.py and the
CLI --bench, so all three report the same number): 48 frames per device
dispatch — the knee of the dispatch-amortization curve re-measured in
round 5 (bench/ladders/r5_fb_ladder_c3.json: 3.96 ms/frame at fb=12,
3.06 at fb=24, 2.98 at fb=48, flat to fb=96; the relay round-trip is
~10-20 ms per dispatch, an order more than rounds 2-4 assumed) —
fetch-synced fences, median of 3 measurement windows; the raw window
band is reported in ``window_mrays``.

OUTAGE RESILIENCE (round-3 lesson: BENCH_r03.json died rc:1 because the
axon relay was down at capture time — and backend init HANGS rather
than failing fast, so a plain try/except cannot save the capture).  The
parent process therefore never touches jax itself:

  1. probe the backend in a SUBPROCESS under a hard timeout,
  2. on success, run the measurement in a second subprocess under a
     generous timeout, with bounded retries + backoff around both,
  3. if the backend stays unreachable, print a clean JSON error record
     (value 0, "error" field) instead of a traceback, and exit 0 so the
     artifact is a parseable record of the outage rather than noise.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

METRIC = "ray_throughput_c3_1080p_1k_particles"
# env-overridable so tests can exercise the outage path in seconds
PROBE_TIMEOUT_S = float(os.environ.get("VOLQ_BENCH_PROBE_TIMEOUT", 150))
MEASURE_TIMEOUT_S = float(os.environ.get("VOLQ_BENCH_MEASURE_TIMEOUT", 1500))
BACKOFFS_S = tuple(float(b) for b in os.environ.get(
    "VOLQ_BENCH_BACKOFFS", "0,60,120").split(","))


def _measure():
    """Child process: the actual measurement. Prints one RESULT line."""
    from volq.engine.loop import time_frames
    from volq.scene.config import c3

    cfg = c3()
    band = []
    dt, _stats = time_frames(cfg, 96, fb=48, windows=3, window_times=band)

    rays = cfg.render.width * cfg.render.height
    mrays = rays / dt / 1e6
    print("RESULT " + json.dumps({
        "metric": METRIC,
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 4),
        "window_mrays": sorted(round(rays / w / 1e6, 1) for w in band),
    }), flush=True)


def _probe_backend(timeout_s: float):
    """Can a fresh process see a device? Run the init in a subprocess so
    a hung relay costs ``timeout_s``, not the whole capture."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
            timeout=timeout_s, capture_output=True, text=True, cwd=REPO)
    except subprocess.TimeoutExpired:
        return False, "backend init hung (> %ds)" % timeout_s
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return False, tail[-1] if tail else "probe rc=%d" % r.returncode
    return True, ""


def main():
    if "--child" in sys.argv:
        _measure()
        return 0

    last_err = "no attempts made"
    for backoff in BACKOFFS_S:
        if backoff:
            time.sleep(backoff)
        ok, err = _probe_backend(PROBE_TIMEOUT_S)
        if not ok:
            last_err = "backend unreachable: " + err
            continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=MEASURE_TIMEOUT_S, capture_output=True, text=True,
                cwd=REPO)
        except subprocess.TimeoutExpired:
            last_err = "measurement hung (> %ds)" % MEASURE_TIMEOUT_S
            continue
        result = next((ln[len("RESULT "):] for ln
                       in reversed(r.stdout.splitlines())
                       if ln.startswith("RESULT ")), None)
        if r.returncode == 0 and result:
            print(result)
            return 0
        tail = (r.stderr or "").strip().splitlines()
        last_err = "measurement rc=%d: %s" % (
            r.returncode, tail[-1] if tail else "no output")

    print(json.dumps({
        "metric": METRIC, "value": 0.0, "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "error": "TPU backend unreachable after %d attempts; last: %s"
                 % (len(BACKOFFS_S), last_err),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
