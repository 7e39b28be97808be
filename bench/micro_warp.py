"""Microbenchmarks for the warp-engine primitives (run on the real TPU).

The warp engine (render/warp.py) bets on three primitives; this measures
each at c3 scale (N=1024 particles, V=128 volumes, R=128 slope grid,
RP=160 pixel rect, S=24 steps, P=73728 pairs, 8x32 tiles) so the design
is grounded in v5e numbers, not guesses.  Timing is fetch-synced
(docs/DESIGN.md §5: block_until_ready lies on the axon relay).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    x = jax.tree.leaves(out)[0]
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def timeit(fn, *args, reps=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def bench_slice_gather(N=1024, RP=160, P=73728, th=8, tw=32):
    """Composite prep: per-pair [th, tw, 4] windows sliced from per-particle
    pixel images [N, RP, RP, 4] at traced offsets (one XLA gather HLO)."""
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (N, RP, RP, 4), jnp.bfloat16)
    pid = jax.random.randint(key, (P,), 0, N)
    oy = jax.random.randint(key, (P,), 0, RP - th)
    ox = jax.random.randint(key, (P,), 0, RP - tw)

    @jax.jit
    def f(imgs, pid, oy, ox):
        starts = jnp.stack([pid, oy, ox, jnp.zeros_like(pid)], -1)
        return jax.lax.gather(
            imgs, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3)),
            slice_sizes=(1, th, tw, 4), mode="clip")

    dt = timeit(f, imgs, pid, oy, ox)
    print(f"slice_gather [{P},{th},{tw},4] from [{N},{RP},{RP},4]: "
          f"{dt*1e3:.2f} ms ({P*th*tw*4*2/dt/1e9:.1f} GB/s)")


def bench_fan_einsum(N=1024, R=128, RP=160):
    """Warp pass 2: out[i,j,c] = sum_v W2[i,v,j] * I1[v,j,c] per particle."""
    key = jax.random.PRNGKey(1)
    W2 = jax.random.normal(key, (N, RP, R, RP), jnp.bfloat16)
    I1 = jax.random.normal(key, (N, R, RP, 4), jnp.bfloat16)

    @jax.jit
    def f(W2, I1):
        return jnp.einsum("nivj,nvjc->nijc", W2, I1,
                          preferred_element_type=jnp.float32)

    dt = timeit(f, W2, I1, reps=4)
    macs = N * RP * R * RP * 4
    print(f"fan_einsum nivj,nvjc->nijc N={N} R={R} RP={RP}: {dt*1e3:.2f} ms "
          f"({macs*2/dt/1e12:.1f} TFLOPs)")


def bench_fan_weight_build(N=1024, R=128, RP=160, chunk=64):
    """Building the [RP, R, RP] hat tensor per particle (VPU)."""
    key = jax.random.PRNGKey(2)
    gi = jax.random.uniform(key, (N, RP, RP), jnp.float32) * (R - 1)

    @jax.jit
    def f(gi):
        v = jnp.arange(R, dtype=jnp.float32)
        W2 = jnp.maximum(0.0, 1.0 - jnp.abs(
            gi[:, :, None, :] - v[None, None, :, None])).astype(jnp.bfloat16)
        return jnp.sum(W2, axis=(1, 2))   # keep it materialized-ish

    dt = timeit(f, gi, reps=4)
    print(f"fan_weight_build [{N},{RP},{R},{RP}]: {dt*1e3:.2f} ms")


def bench_march_loop(N=1024, R=128, V=128, S=24, chunk=64):
    """Slope-grid march: per step build Wx [c,R,V], WyT [c,V,R] and
    contract Wx @ slab @ WyT (both NN-layout) with z-lerped slabs from
    per-particle volumes."""
    key = jax.random.PRNGKey(3)
    vols = jax.random.uniform(key, (N, V, V, V), jnp.bfloat16)
    a = jax.random.uniform(key, (N,), jnp.float32)
    b = jax.random.uniform(key, (N,), jnp.float32) * 0.5 + 0.5

    @jax.jit
    def f(vols, a, b):
        def chunk_fn(args):
            cv, ca, cb = args
            i = jnp.arange(R, dtype=jnp.float32)
            vv = jnp.arange(V, dtype=jnp.float32)

            def step(s, carry):
                Cacc, T = carry
                zeta = (s.astype(jnp.float32) + 0.5) / S
                z0 = jnp.clip(jnp.floor(zeta * (V - 1)), 0, V - 2).astype(
                    jnp.int32)
                fz = zeta * (V - 1) - z0.astype(jnp.float32)
                sl = jax.lax.dynamic_slice(
                    cv, (0, z0, 0, 0), (chunk, 2, V, V)).astype(jnp.float32)
                slab = (sl[:, 0] + (sl[:, 1] - sl[:, 0]) * fz).astype(
                    jnp.bfloat16)
                gx = (ca[:, None] + cb[:, None] * i * (1 + 0.01 * zeta))
                Wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                    gx[..., None] - vv)).astype(jnp.bfloat16)   # [c,R,V]
                WyT = jnp.maximum(0.0, 1.0 - jnp.abs(
                    gx[:, None, :] * 0.97 - vv[:, None])).astype(
                    jnp.bfloat16)                               # [c,V,R]
                t1 = jnp.einsum("nrv,nvw->nrw", Wx, slab,
                                preferred_element_type=jnp.bfloat16)
                sig = jnp.einsum("nrw,nwq->nrq", t1, WyT,
                                 preferred_element_type=jnp.float32)
                alpha = 1.0 - jnp.exp(-sig * 0.1)
                Cacc = Cacc + T * alpha
                T = T * (1.0 - alpha)
                return Cacc, T

            C0 = jnp.zeros((chunk, R, R), jnp.float32)
            T0 = jnp.ones((chunk, R, R), jnp.float32)
            return jax.lax.fori_loop(0, S, step, (C0, T0))

        nc = N // chunk
        C, T = jax.lax.map(chunk_fn, (vols.reshape(nc, chunk, V, V, V),
                                      a.reshape(nc, chunk),
                                      b.reshape(nc, chunk)))
        return C

    dt = timeit(f, vols, a, b, reps=4)
    macs = N * S * (R * V * V + R * V * R)
    print(f"march_loop N={N} R={R} V={V} S={S} chunk={chunk}: "
          f"{dt*1e3:.2f} ms ({macs*2/dt/1e12:.1f} TFLOPs)")


def bench_canvas_composite(N=1024, RP=192, H=1080, W=1920, align=128,
                           dtype=jnp.float32):
    """Depth-ordered per-particle OVER onto a padded PLANAR canvas
    [4, Hc, Wc]: window x-origins snapped to the 128-lane grid (window
    widened by ``align``), y to sublanes; channels stay off the tiled dims
    (a trailing dim of 4 lane-pads 4 -> 128: 32x traffic)."""
    key = jax.random.PRNGKey(6)
    RPX = RP + align
    imgs = jax.random.uniform(key, (N, 4, RP, RPX), jnp.bfloat16)
    oy = (jax.random.randint(key, (N,), 0, H) // 8) * 8
    ox = (jax.random.randint(key, (N,), 0, W) // align) * align

    @jax.jit
    def f(imgs, oy, ox):
        Hc = H + 2 * RP
        Wc = W + 2 * RPX
        canvas = jnp.zeros((3, Hc, Wc), dtype)
        trans = jnp.ones((Hc, Wc), dtype)

        def body(k, carry):
            C, T = carry
            img = jax.lax.dynamic_slice(
                imgs, (k, 0, 0, 0), (1, 4, RP, RPX))[0].astype(dtype)
            y, x = oy[k], ox[k]
            Cw = jax.lax.dynamic_slice(C, (0, y, x), (3, RP, RPX))
            Tw = jax.lax.dynamic_slice(T, (y, x), (RP, RPX))
            Cw = Cw + Tw[None] * img[:3]
            Tw = Tw * img[3]
            C = jax.lax.dynamic_update_slice(C, Cw, (0, y, x))
            T = jax.lax.dynamic_update_slice(T, Tw, (y, x))
            return C, T

        return jax.lax.fori_loop(0, N, body, (canvas, trans))

    dt = timeit(f, imgs, oy, ox, reps=4)
    traffic = N * RP * RPX * (4 * 2 + 4 * 4 * 2)
    print(f"canvas_composite N={N} RP={RP} align={align}: {dt*1e3:.2f} ms "
          f"(~{traffic/dt/1e9:.0f} GB/s)")


def bench_shift_warp(N=1024, RP=192, K=10, chunk=64):
    """The fan correction: out[i,j] = lerp_u img[i + delta(i,j), j] as a
    masked sum over static integer shifts d in [-K, K].  Planar images
    [c, 4, i, j]; the shift axis i is the sublane axis."""
    key = jax.random.PRNGKey(7)
    imgs = jax.random.uniform(key, (N, 4, RP, RP), jnp.float32)
    Xi = jax.random.uniform(key, (N, RP), jnp.float32) * 2 - 1
    Ej = jax.random.uniform(key, (N, RP), jnp.float32) * 8

    @jax.jit
    def f(imgs, Xi, Ej):
        def chunk_fn(args):
            img, xi, ej = args
            delta = jnp.clip(xi[:, :, None] * ej[:, None, :], -K, K - 1)
            d0 = jnp.floor(delta)
            fr = (delta - d0)[:, None]
            pad = jnp.pad(img, ((0, 0), (0, 0), (K, K + 1), (0, 0)))
            out = jnp.zeros_like(img)
            for d in range(-K, K):
                lo = pad[:, :, K + d:K + d + RP]      # img[i + d, j] view
                hi = pad[:, :, K + d + 1:K + d + 1 + RP]
                m = (d0 == d).astype(jnp.float32)[:, None]
                out = out + m * ((1.0 - fr) * lo + fr * hi)
            return out

        nc = N // chunk
        return jax.lax.map(chunk_fn, (imgs.reshape(nc, chunk, 4, RP, RP),
                                      Xi.reshape(nc, chunk, RP),
                                      Ej.reshape(nc, chunk, RP)))

    dt = timeit(f, imgs, Xi, Ej, reps=4)
    print(f"shift_warp N={N} RP={RP} K={K}: {dt*1e3:.2f} ms")


def bench_binning_sort(N=1024, MT=96):
    """The round-1 binning argsort over N*MT keys."""
    key = jax.random.PRNGKey(4)
    keys = jax.random.randint(key, (N * MT,), 0, 2**30)

    @jax.jit
    def f(k):
        return jnp.argsort(k)

    dt = timeit(f, keys)
    print(f"argsort {N*MT} keys: {dt*1e3:.2f} ms")


def bench_composite_loop(P=73728, T=8100, tp=256, K=96):
    """The per-tile K-iteration row-gather composite (round-1 design)."""
    key = jax.random.PRNGKey(5)
    C_pair = jax.random.normal(key, (P, tp, 3), jnp.float32)
    t_pair = jax.random.uniform(key, (P, tp), jnp.float32)
    seg = jnp.sort(jax.random.randint(key, (T,), 0, P))
    cnt = jnp.full((T,), K, jnp.int32)

    @jax.jit
    def f(C_pair, t_pair, seg, cnt):
        def body(k, carry):
            C, Tt = carry
            q = jnp.minimum(seg + k, P - 1)
            use = k < cnt
            Ck = jnp.where(use[:, None, None], C_pair[q], 0.0)
            tk = jnp.where(use[:, None], t_pair[q], 1.0)
            C = C + Tt[..., None] * Ck
            Tt = Tt * tk
            return C, Tt

        C0 = jnp.zeros((T, tp, 3), jnp.float32)
        T0 = jnp.ones((T, tp), jnp.float32)
        return jax.lax.fori_loop(0, K, body, (C0, T0))

    dt = timeit(f, C_pair, t_pair, seg, cnt, reps=4)
    print(f"composite K-loop T={T} K={K}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1:] or ["slice_gather", "fan_einsum", "fan_weight_build",
                             "march_loop", "binning_sort", "composite_loop"]
    for name in which:
        globals()[f"bench_{name}"]()
