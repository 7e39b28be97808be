"""Can a Mosaic window DMA take a 16-aligned (not 128-aligned) dynamic
LANE offset when the slice SHAPE stays 128?

Round-5 question: the fused kernel's canvas windows are sized
WW = RP + 128 because window corners are snapped to the 128-lane
granule (kernel.canvas_geom: gx = 128 // e) — for c4's RP=112 rect
that means [WH, 256] windows, 2.3x the rect's bytes, and the
up_xplace epilogue dot pays N=256 (125.8 ns vs ~64 at N=128,
bench/ladders/r5_mxu_probe_pipe.json).  If the DMA engine accepts a
finer corner granule (16 px), the window is ONE 128-lane slice
(112 + 16 = 128) — no B half, half the window bytes, half the RMW
width.  The known-hard constraint is on slice SHAPES ("must be
aligned to tiling (128)", kernel._canvas_dims); whether dynamic
OFFSETS share it is exactly what this probe compiles and checks.

Three arms, each fetch->RMW->write-back over a [8, 128] window per
grid step against an HBM canvas, offsets precomputed host-side:
  a128: offsets 128-aligned (the shipped protocol's shape);
  a16 : offsets 16-aligned;
  a8  : offsets 8-aligned (curiosity bound).
Each arm checks bit-exact correctness against numpy and times the
kernel.  A Mosaic compile error on a16 settles the question the
other way.

Usage: python bench/granule_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1088, 2048
WH, WW = 8, 128
N = 4096


def _kernel(off_ref, canvas_in, canvas_out, win, sem_in, sem_out, *,
            align):
    n = pl.program_id(0)
    b = jax.lax.rem(n, 2)
    y = pl.multiple_of(off_ref[2 * n], 8)
    x = pl.multiple_of(off_ref[2 * n + 1], align)

    def cin():
        return pltpu.make_async_copy(
            canvas_out.at[pl.ds(y, WH), pl.ds(x, WW)],
            win.at[b], sem_in.at[b])

    def cout():
        return pltpu.make_async_copy(
            win.at[b], canvas_out.at[pl.ds(y, WH), pl.ds(x, WW)],
            sem_out.at[b])

    # serialized (no cross-step overlap — this probes legality + DMA
    # rate, not the production protocol): fetch, RMW, write back, wait
    cin().start()
    cin().wait()
    win[b] = win[b] + jnp.float32(1.0)
    co = cout()
    co.start()
    co.wait()


def run(align, reps=3):
    # offsets: y 8-aligned in [0, H-WH]; x align-aligned in [0, W-WW]
    rng = np.random.RandomState(0)
    ys = (rng.randint(0, (H - WH) // 8, size=N) * 8).astype(np.int32)
    xs = (rng.randint(0, (W - WW) // align, size=N) * align).astype(
        np.int32)
    off = np.stack([ys, xs], 1).reshape(-1)
    canvas = jnp.zeros((H, W), jnp.float32)

    f = pl.pallas_call(
        functools.partial(_kernel, align=align),
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, WH, WW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )
    jf = jax.jit(f)
    out = jf(jnp.asarray(off), canvas)
    outv = np.asarray(out)

    ref = np.zeros((H, W), np.float32)
    for i in range(N):
        ref[ys[i]:ys[i] + WH, xs[i]:xs[i] + WW] += 1.0
    ok = bool((outv == ref).all())

    ts = []
    for _ in range(reps):
        canvas = jnp.zeros((H, W), jnp.float32)
        t0 = time.perf_counter()
        out = jf(jnp.asarray(off), canvas)
        float(jnp.sum(out[:1, :8]))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    per = dt / N * 1e9
    print(f"align={align:4d}  exact={ok}  {dt*1e3:7.3f} ms "
          f"({per:6.0f} ns/window)", flush=True)
    return ok


def main():
    print("devices:", jax.devices())
    for align in (128, 16, 8):
        try:
            run(align)
        except Exception as e:
            print(f"align={align:4d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
