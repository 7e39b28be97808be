"""Per-resource roofline for the fused warp kernel (VERDICT r3 item 8):
an analytic traffic/FLOP model of one frame, divided by measured chip
calibrations, so "is it actually fast" has a denominator.

    python bench/roofline.py c3 c4          # model + floors (host-only)
    python bench/roofline.py --calibrate    # re-measure MXU/HBM on device
    python bench/roofline.py c3 --measure   # also time the real frame

The model counts what the kernel actually moves/computes (same formulas
as the block specs in render/kernel.py):
  * slab DMA: per particle one [S, VX, V] pre-lerped stack (resident
    banks stream it ONCE total; c4's density bank is resident);
  * window DMA: per particle the A half [4, WH, WWA] fetch + write-back
    and, for the measured wide fraction, the B half;
  * MXU: per grid step dot1 [MR, 2V]x[2V, MR-ish] hat contraction and
    the merged dot2 [MR, U*VX] x [U*VX, MR] (paired shapes when PAIR);
  * canvas: zero-init + finish pass over [4, Hc, Wc].

Calibrations (measured on this chip, fetch-synced — see
docs/DESIGN.md §6 for why block_until_ready cannot time):
  MXU bf16 127 TFLOPs (8192^3 matmul), HBM ~600 GB/s sustained copy.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--calibrate" not in sys.argv and "--measure" not in sys.argv:
    # model-only mode never touches a device; don't let a down TPU
    # relay hang the host-side math (sitecustomize pins axon)
    import jax
    jax.config.update("jax_platforms", "cpu")

MXU_TFLOPS = 127.0          # measured: 8192^3 bf16 matmul, fetch-synced
HBM_GBPS = 600.0            # measured: large device-to-device copy
# the calibration record is COMMITTED (bench/ladders/, not the
# gitignored bench/out/) so the numbers under every emitted table stay
# reproducible after the session dies (VERDICT r4: the 225 GB/s that
# produced a measured-below-floor row was unreproducible)
_CALIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ladders", "calib.json")
try:                        # prefer this chip's own --calibrate record
    with open(_CALIB_PATH) as _f:
        _c = json.load(_f)
    MXU_TFLOPS, HBM_GBPS = _c["mxu_tflops"], _c["hbm_gbps"]
except (OSError, ValueError, KeyError):
    pass


def calibrate():
    import time
    import jax
    import jax.numpy as jnp
    from volq.engine.loop import _sync

    n = 8192
    a = jnp.zeros((n, n), jnp.bfloat16)
    b = jnp.zeros((n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    c = mm(a, b)
    _sync(c)
    t0 = time.perf_counter()
    for _ in range(8):
        c = mm(a, c)
    _sync(c)
    dt = (time.perf_counter() - t0) / 8
    tflops = 2 * n ** 3 / dt / 1e12

    # HBM: donated in-place add over 512 MB.  CHAINED iterations (y
    # feeds y) so one dispatch can't overlap the next; 32 reps dilute
    # the per-dispatch relay latency that sank the round-4 record to
    # an unreproducible 225 GB/s (a single 1.3 ms rep is comparable to
    # the relay's dispatch jitter; 32 chained reps are not).
    big = jnp.zeros((256, 1024, 1024), jnp.bfloat16)   # 512 MB
    cp = jax.jit(lambda x: x + 1, donate_argnums=(0,))
    y = cp(big)
    _sync(y)
    reps = 32
    t0 = time.perf_counter()
    for _ in range(reps):
        y = cp(y)
    _sync(y)
    dt = (time.perf_counter() - t0) / reps
    nbytes = 2 * 256 * 1024 * 1024 * 2                 # read + write
    gbps = nbytes / dt / 1e9
    rec = {"mxu_tflops": round(tflops, 1), "hbm_gbps": round(gbps, 1),
           "hbm_reps": reps, "device": str(jax.devices()[0])}
    print(json.dumps(rec))
    with open(_CALIB_PATH, "w") as f:
        json.dump(rec, f)


def model(name, variant=None):
    from volq.scene.config import PRESETS
    from volq.render.warp import march_rect, slab_vx_eff
    from volq.render.kernel import (pair_enabled, stack_bank_resident,
                                    canvas_geom)

    cfg = PRESETS[name]()
    if variant:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "psnr_c3", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "psnr_c3.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        cfg = m.variant_cfg(cfg, variant)
    r = cfg.render
    N = cfg.n_particles
    V = cfg.volume.size
    M = cfg.volume.bank_size
    S = r.steps
    RM = march_rect(cfg)
    RP = r.warp_rect
    VX = slab_vx_eff(cfg, V)
    lit = r.light_steps > 0
    center = lit and r.light_mode == "center"
    itm = 4 if r.warp_fp32 else 2
    cit = 4 if r.warp_canvas_fp32 else 2

    dens_bytes = M * S * VX * V * itm
    resident = stack_bank_resident(
        (__import__("numpy").zeros((M, S, VX, V),
                                   "float32" if itm == 4 else "float16"),
         None), lit, center)
    pair = pair_enabled(cfg, N, True, lit, center, resident)
    PW = 2 if pair else 1
    MR = PW * RM

    # ---- HBM traffic (bytes/frame) ------------------------------------
    slab = dens_bytes if resident else N * S * VX * V * itm
    if lit:
        slab += (N * VX * V * itm if center and not resident else
                 (dens_bytes if resident else N * S * VX * V * itm))
    g = canvas_geom(cfg, r.height)
    WH, WW, WWA = g.WH, g.WW, g.WWA
    WWB = WW - WWA
    # wide when the sub-granule x offset pushes the placement past the
    # A half: dxu in [0, gx) cells, wide iff e*(dxu + sup) > WWA
    wide_frac = (min(max((g.gx - (WWA / g.e - g.sup)) / g.gx, 0.0), 1.0)
                 if WWB else 0.0)
    planes = 1 if g.ilv else 4               # window lane span covers
    #                                          all 4 channels when ilv
    win = N * planes * WH * (WWA + wide_frac * WWB) * cit * 2
    canvas = planes * g.Hc * g.Wc * cit * 3  # zero + finish read/write
    if g.ilv:
        canvas += 2 * g.Hc * g.Wc * cit      # one de-interleave pass
    if g.coarse:                             # cell->pixel upsample pass
        canvas += 4 * (g.hc_img * g.wc_img * cit
                       + r.height * r.width * 4)
    out_img = r.height * r.width * 4 * 4

    # ---- MXU FLOPs (per frame) ----------------------------------------
    # dot1 per unrolled step: [MR, PW*V] x [PW*V, VX]-shaped hat
    # contraction; merged dot2: [MR, U*VX] x [U*VX, MR]
    dot1 = N // PW * S * 2 * MR * (PW * V) * VX
    dot2 = N // PW * S * 2 * MR * VX * MR
    # Uy/Ux placement in x units (array widths / e); channels always 4
    place = N * 4 * (WH * RM * RM + WH * RM *
                     (WWA + wide_frac * WWB) / g.e) * 2
    flops = dot1 + dot2 + place
    if g.coarse:                             # upsample einsums (MXU)
        flops += 2 * 4 * (r.height * g.hc_img * g.wc_img
                          + r.height * r.width * g.wc_img)

    t_mxu = flops / (MXU_TFLOPS * 1e12)
    t_hbm = (slab + win + canvas + out_img) / (HBM_GBPS * 1e9)
    fixed = (N // PW) * (S // max(1, S)) * 0  # per-grid fixed in stalls
    return {
        "config": name + (f":{variant}" if variant else ""),
        "paired": bool(pair), "resident_bank": resident,
        "layout": {"coarse": g.coarse, "ilv": g.ilv},
        "bytes": {"slab": slab, "window": win, "canvas": canvas,
                  "total": slab + win + canvas + out_img},
        "flops_T": round(flops / 1e12, 3),
        "floor_ms": {"mxu": round(t_mxu * 1e3, 2),
                     "hbm": round(t_hbm * 1e3, 2),
                     "max": round(max(t_mxu, t_hbm) * 1e3, 2)},
        "wide_frac": round(wide_frac, 3),
        "window_dims": [WH, WWA, WWB],
    }


def main():
    args = [a for a in sys.argv[1:]]
    if "--calibrate" in args:
        calibrate()
        return
    names = [a for a in args if not a.startswith("--")] or ["c3", "c4"]
    out = []
    for spec in names:
        n, _, variant = spec.partition(":")   # e.g. c4:coarse+ilv
        rec = model(n, variant or None)
        if "--measure" in args:
            from volq.engine.loop import time_frames
            from volq.scene.config import PRESETS
            mcfg = PRESETS[n]()
            if variant:
                import importlib.util
                sp = importlib.util.spec_from_file_location(
                    "psnr_c3", os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "psnr_c3.py"))
                pm = importlib.util.module_from_spec(sp)
                sp.loader.exec_module(pm)
                mcfg = pm.variant_cfg(mcfg, variant)
            dt, _ = time_frames(mcfg, 96, fb=48, windows=3)
            rec["measured_ms"] = round(dt * 1e3, 2)
            rec["x_of_floor"] = round(dt * 1e3
                                      / max(rec["floor_ms"]["max"], 1e-9),
                                      2)
            # a floor is a LOWER bound: measured below it means the
            # traffic model or the calibration is wrong — flag it so
            # the emitted table can't silently present a broken model
            # (VERDICT r4: c3 printed 0.81x of its "HBM floor")
            rec["model_error"] = rec["x_of_floor"] < 1.0
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "out", "roofline.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
