"""Per-frame light optical-depth bake (SURVEY.md C8, slab-engine form).

The exact renderer marches secondary rays toward the light per sample —
8 more gathers per sample, which the slab engine cannot afford.  Instead
the directional-light optical depth is baked into a volume once per frame
per bank entry, by the classic slice-sweep: starting from the light-entry
face, each z-slice's accumulated depth is the previous (closer-to-light)
slice's depth resampled along the in-plane light drift plus the local
density contribution (trapezoid rule).  Pure shifts + lerps — no gather.

The baked value is tau_raw = integral of *unit-scale* volume density over
the path in NORMALIZED extent (volume treated as a unit cube): optical
depth is linear in both extinction scale and world size, so the march
applies  atten = exp(-density_scale * fade * ext * tau)  per particle —
exact with respect to this bake's quadrature, including per-particle fade
and size (oracle/slab_cpu.py samples the identical baked volume).

Limitation (documented): the sweep runs along the volume z axis; the
in-plane drift per slice is L_xy / |L_z|, so light directions nearly
perpendicular to z degrade (|L_z| is clamped to MIN_LZ).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_LZ = 0.15


def _shift2d(a, dx, dy):
    """Shift [..., X, Y] by (+dx, +dy) fractional voxels, zero padding:
    out[x, y] = a[x + dx, y + dy] (bilinear, vacuum outside)."""
    X, Y = a.shape[-2], a.shape[-1]

    def shift1(arr, d, axis_len, axis):
        i0 = jnp.floor(d).astype(jnp.int32)
        f = d - i0.astype(jnp.float32)
        pad = axis_len  # worst-case drift bounded by one full volume
        pads = [(0, 0)] * arr.ndim
        pads[axis - 2] = (pad, pad)
        padded = jnp.pad(arr, pads)
        start = [0] * arr.ndim
        start[axis - 2] = pad + i0
        sizes = list(arr.shape)
        a0 = jax.lax.dynamic_slice(padded, start, sizes)
        start[axis - 2] = pad + i0 + 1
        a1 = jax.lax.dynamic_slice(padded, start, sizes)
        return a0 + (a1 - a0) * f

    out = shift1(a, dx, X, 0)
    out = shift1(out, dy, Y, 1)
    return out


def bake_light_volumes(volumes, light_dir):
    """volumes: [M, V, V, V] (z-major) densities.  light_dir: [3] unit
    vector toward the light.  Returns tau_raw [M, V, V, V] f32."""
    M, V = volumes.shape[0], volumes.shape[-1]
    vols = volumes.astype(jnp.float32)
    lx, ly, lz = light_dir[0], light_dir[1], light_dir[2]
    sgn = jnp.where(lz >= 0, 1.0, -1.0)
    alz = jnp.maximum(jnp.abs(lz), MIN_LZ)
    # in-plane voxel drift per one-voxel z step toward the light, and the
    # world path length per step for a unit-cube volume
    dx = lx / alz * sgn
    dy = ly / alz * sgn
    dl = (1.0 / (V - 1)) / alz

    # slice order: from the light-entry face inward.
    # lz > 0 -> light enters at z = V-1, sweep k = V-1 .. 0
    ks_fwd = jnp.arange(V, dtype=jnp.int32)
    ks = jnp.where(lz >= 0, V - 1 - ks_fwd, ks_fwd)

    def get_slice(k):
        return jax.lax.dynamic_slice(
            vols, (0, k, 0, 0), (M, 1, V, V))[:, 0]      # [M,V,V]

    def body(carry, k):
        tau_prev, sig_prev = carry
        sig_k = get_slice(k)
        # path from this slice's voxel centers toward the light crosses
        # the previous slice at (+dx, +dy) voxels in-plane
        tau_k = (_shift2d(tau_prev, dx, dy)
                 + 0.5 * (sig_k + _shift2d(sig_prev, dx, dy)) * dl)
        return (tau_k, sig_k), tau_k

    zero = jnp.zeros((M, V, V), jnp.float32)
    entry_sig = get_slice(ks[0])
    # entry slice: tau = 0 (no material between the entry face voxels and
    # the light); scan the remaining V-1 slices
    (_, _), taus = jax.lax.scan(body, (zero, entry_sig), ks[1:])
    taus = jnp.concatenate([zero[None], taus], axis=0)   # [V, M, V, V]

    # scatter the sweep order back to ascending-z storage: sweep index i
    # wrote slice ks[i]
    out = jnp.zeros((V, M, V, V), jnp.float32).at[ks].set(taus)
    return out.transpose(1, 0, 2, 3)                      # [M, V, V, V]
