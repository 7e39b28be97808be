"""Per-grid-step cost of Pallas input specs + grid machinery on v5e.

The r5 compound ablations left c4 with a ~5.1 ms BASE (march, epilogue,
window DMAs, init/du/exp chains ALL removed) = ~2.5 us/pair across a
(2048, 1) grid — pure machinery.  The fused kernel carries ~12 block
specs (slab/light/gf/rxu/ryw/camf/lightf/canvas/...), each with an
index map evaluated EVERY grid step plus block bookkeeping.  This
probe prices that directly: a pallas_call over grid (G, 1) with K
per-step-indexed [8, 128] VMEM inputs (imap n -> (n % M, 0, 0), so
blocks genuinely change) and a trivial body, swept over K and G.

  python bench/specs_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    return float(jnp.sum(out.reshape(-1)[:4].astype(jnp.float32)))


def run(K, G, reps=5, smem=0, const=0):
    """K per-step VMEM specs (+ ``smem`` SMEM specs + ``const``
    constant-imap VMEM specs), trivial body, grid (G, 1)."""
    M = 64

    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        n = pl.program_id(0)

        @pl.when(n == 0)
        def _z():
            out[...] = jnp.zeros_like(out)
        # touch one input block so nothing is DCE'd
        out[...] = out[...] + ins[0][0]

    specs = [pl.BlockSpec((1, 8, 128), lambda n, s: (n % M, 0, 0),
                          memory_space=pltpu.VMEM) for _ in range(K)]
    specs += [pl.BlockSpec((1, 1, 16), lambda n, s: (n % M, 0, 0),
                           memory_space=pltpu.SMEM) for _ in range(smem)]
    specs += [pl.BlockSpec((1, 8, 128), lambda n, s: (0, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(const)]
    args = [jnp.ones((M, 8, 128), jnp.float32)] * K \
        + [jnp.ones((M, 1, 16), jnp.float32)] * smem \
        + [jnp.ones((M, 8, 128), jnp.float32)] * const
    f = pl.pallas_call(
        kernel, grid=(G, 1), in_specs=specs,
        out_specs=pl.BlockSpec((8, 128), lambda n, s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )
    jf = jax.jit(f)
    _sync(jf(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(jf(*args))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"K={K:3d} smem={smem} const={const} G={G:5d}: "
          f"{dt*1e3:8.3f} ms  ({dt/G*1e9:7.1f} ns/step)", flush=True)
    return dt


def main():
    print("devices:", jax.devices())
    G = 2048
    for K in (1, 2, 4, 8, 12):
        run(K, G)
    run(2, G, smem=3)           # the kernel's SMEM-ish mix
    run(2, G, const=4)          # constant-imap blocks: free or not?
    run(4, 4096)                # G scaling
    run(4, 8192)
    return 0


if __name__ == "__main__":
    sys.exit(main())
