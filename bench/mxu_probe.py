"""Measure the v5e MXU's TRUE cost model on the warp kernel's dot shapes.

Round-5 opener: DESIGN §5h#1 sizes the paired dot1's zero half-panels
at ~0.9 ms of c4's 1.75 ms MXU floor — but that sizing assumes a
FLOP-proportional cost model (padded to 128 per dim).  Three candidate
models predict DIFFERENT winners for the zero-free rework:

  * FLOP/tile-padded:  cost ∝ ceil(M/128)·ceil(K/128)·ceil(N/128)
                       → association-swapped packing halves c4's dots;
  * M-streaming:       cost ∝ M·ceil(K/128)·ceil(N/128)
                       → the swap is a wash (M cycles conserved);
  * sublane-streaming: cost ∝ ceil(M/8)·... (same as M-streaming at
                       these Ms, differs at M<8 only).

This probe times pallas kernels that do NOTHING but repeated bf16
dot_generals (f32 accumulate, same flags as render/kernel.py) on
VMEM-resident operands, across the exact shapes in play:

  dot1 shapes:  [64,64,64] (c4 unpaired)  [128,128,64] (c4 paired,
                half-zero K panels — the MXU does not skip zeros, so
                this times the dense equivalent)  [64,128,64]
                (zero-free 2-step K-pack)  [80,128,64] (c3 dot1)
  dot2 shapes:  [128,1280,128] (c4 paired merged dot2, U=20 VX=64)
                [64,1280,64] (association-swapped dot_c)
                [80,1280,80] (c3 merged dot2)
  M/K/N sweeps: isolate each dim's marginal cost.

Timing is fetch-synced (block_until_ready lies on the axon relay —
DESIGN §6); per-grid-step fixed cost (~290 ns) is diluted by unrolling
R dots per grid step (R sized so dot work ≥ ~6 µs/step).

Usage:  python bench/mxu_probe.py [--json=bench/out/mxu_probe.json]
"""
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _sync(out):
    x = jax.tree.leaves(out)[0]
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def _dot_kernel(a_ref, b_ref, o_ref, *, R, NACC=1):
    """R dots per grid step.  NACC=1 chains every dot through one
    accumulator add (serialized — measures the isolated per-pass cost
    incl. pipeline fill).  NACC=8 round-robins 8 accumulators so up to
    8 dots are in flight (measures the PIPELINED per-pass cost — the
    kernel's y_parts pattern, 20 independent dot1s per grid step)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    accs = [o_ref[...]] + [jnp.zeros_like(o_ref[...])
                           for _ in range(NACC - 1)]
    for i in range(R):
        accs[i % NACC] = accs[i % NACC] + jax.lax.dot_general(
            a_ref[i], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[...] = acc


def time_shape(M, K, N, reps=5, target_step_ns=6000.0,
               target_call_ms=25.0, NACC=1):
    """Median seconds per DOT of [M,K]x[K,N] bf16->f32."""
    # crude prior for sizing R and G only (NOT the model under test)
    est_ns = (math.ceil(M / 128) * math.ceil(K / 128)
              * math.ceil(N / 128)) * 40.0
    R = int(max(4, min(192, round(target_step_ns / est_ns))))
    # VMEM: A [R,M,K] + B [K,N] + out [M,N] f32, keep A under ~5 MB
    while R > 4 and R * M * K * 2 > 5 * 2 ** 20:
        R //= 2
    G = int(max(8, min(65536, round(target_call_ms * 1e6 / (R * est_ns)))))
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (R, M, K), jnp.float32).astype(jnp.bfloat16)
    B = jax.random.normal(key, (K, N), jnp.float32).astype(jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(_dot_kernel, R=R, NACC=NACC),
        grid=(G,),
        in_specs=[pl.BlockSpec((R, M, K), lambda g: (0, 0, 0)),
                  pl.BlockSpec((K, N), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )
    jf = jax.jit(f)
    _sync(jf(A, B))                       # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jf(A, B)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    per_dot = sorted(ts)[len(ts) // 2] / (R * G)
    return per_dot, R, G


SHAPES = [
    # tag, M, K, N
    ("full_tile",        128,  128, 128),
    ("c4_dot1_unpaired",  64,   64,  64),
    ("c4_dot1_paired",   128,  128,  64),
    ("c4_dot1_kpack2",    64,  128,  64),
    ("c3_dot1",           80,  128,  64),
    ("c3_dot1_m128",     128,  128,  64),
    ("m_sweep_16",        16,  128, 128),
    ("m_sweep_32",        32,  128, 128),
    ("m_sweep_64",        64,  128, 128),
    ("m_sweep_256",      256,  128, 128),
    ("k_sweep_32",       128,   32, 128),
    ("k_sweep_64",       128,   64, 128),
    ("k_sweep_256",      128,  256, 128),
    ("n_sweep_32",       128,  128,  32),
    ("n_sweep_64",       128,  128,  64),
    ("n_sweep_256",      128,  128, 256),
    ("c4_dot2_paired",   128, 1280, 128),
    ("c4_dot2_swap",      64, 1280,  64),
    ("c3_dot2",           80, 1280,  80),
    ("c3_dot2_m128",     128, 1280,  80),
]


PIPE_SHAPES = [
    ("full_tile",        128,  128, 128),
    ("c4_dot1_unpaired",  64,   64,  64),
    ("c4_dot1_paired",   128,  128,  64),
    ("c3_dot1",           80,  128,  64),
    ("m_sweep_64",        64,  128, 128),
    ("c4_dot2_paired",   128, 1280, 128),
    ("up_tlist",         120,   64,  64),   # epilogue y-contraction
    ("up_xplace",        120,   64, 256),   # epilogue x placement
]


def main(argv):
    out_path = None
    pipe_only = "--pipe" in argv
    for a in argv:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    print("devices:", jax.devices())
    recs = []
    print(f"{'tag':22s} {'M':>4s} {'K':>5s} {'N':>4s} "
          f"{'ns/dot':>8s} {'TFLOP/s':>8s} {'R':>4s} {'G':>6s}")
    shapes = [] if pipe_only else SHAPES
    for tag, M, K, N in shapes:
        per_dot, R, G = time_shape(M, K, N)
        tflops = 2.0 * M * K * N / per_dot / 1e12
        recs.append(dict(tag=tag, M=M, K=K, N=N, ns_per_dot=per_dot * 1e9,
                         tflops=tflops, R=R, G=G))
        print(f"{tag:22s} {M:4d} {K:5d} {N:4d} "
              f"{per_dot * 1e9:8.1f} {tflops:8.1f} {R:4d} {G:6d}")
    # pipelined variants: 8 independent accumulator chains
    for tag, M, K, N in PIPE_SHAPES:
        per_dot, R, G = time_shape(M, K, N, NACC=8)
        tflops = 2.0 * M * K * N / per_dot / 1e12
        tag = tag + ":pipe8"
        recs.append(dict(tag=tag, M=M, K=K, N=N, ns_per_dot=per_dot * 1e9,
                         tflops=tflops, R=R, G=G))
        print(f"{tag:22s} {M:4d} {K:5d} {N:4d} "
              f"{per_dot * 1e9:8.1f} {tflops:8.1f} {R:4d} {G:6d}")
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(recs, f, indent=1)
        print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
