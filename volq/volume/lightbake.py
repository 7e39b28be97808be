"""Per-frame light optical-depth bake (SURVEY.md C8, slab-engine form).

The exact renderer marches secondary rays toward the light per sample —
8 more gathers per sample, which the slab engine cannot afford.  Instead
the directional-light optical depth is baked into a volume once per frame
per bank entry, by the classic slice-sweep: starting from the light-entry
face, each slice's accumulated depth is the previous (closer-to-light)
slice's depth resampled along the in-plane light drift plus the local
density contribution (trapezoid rule).  Pure shifts + lerps — no gather.

The baked value is tau_raw = integral of *unit-scale* volume density over
the path in NORMALIZED extent (volume treated as a unit cube): optical
depth is linear in both extinction scale and world size, so the march
applies  atten = exp(-density_scale * fade * ext * tau)  per particle —
exact with respect to this bake's quadrature, including per-particle fade
and size (oracle/slab_cpu.py samples the identical baked volume).

Sweep axis: the sweep runs along the volume axis most aligned with the
light (``dominant_axis``), so the in-plane drift per slice is at most 1
voxel per step (|L_plane| / |L_axis| <= sqrt(2) for the dominant axis) and
arbitrary light directions are supported — there is no restricted cone.
The drift toward the light is L_plane / |L_axis| *regardless* of which
face the light enters (only the sweep order depends on the sign); a
round-1 bug multiplied the drift by sign(L_axis), mirroring shadows for
lights entering at the low face (tests/test_slab.py parametrizes both
signs and an in-plane-dominant light against a brute-force march).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Pure safety net: dominant_axis guarantees |la| >= 1/sqrt(3), so this
# floor is unreachable through the public API — it only guards direct
# _sweep_tau calls with a non-dominant axis (e.g. exploratory tests).
MIN_LAXIS = 0.15


def dominant_axis(direction) -> int:
    """World axis index (0=x, 1=y, 2=z) with the largest |component|.
    Call with the *static* config tuple so the sweep layout is compile-time
    (|component| >= 1/sqrt(3) for the dominant axis, far from MIN_LAXIS)."""
    d = [abs(float(direction[0])), abs(float(direction[1])),
         abs(float(direction[2]))]
    return int(max(range(3), key=lambda i: d[i]))


# Volume storage is z-major [M, V_z, V_x, V_y] (core/interp.py).  For a
# sweep along world axis w: (transpose putting w's volume dim at axis 1,
# inverse transpose, light component on the transposed dim -2, on dim -1).
_SWEEPS = {
    2: ((0, 1, 2, 3), (0, 1, 2, 3), 0, 1),   # sweep z; plane dims (x, y)
    0: ((0, 2, 1, 3), (0, 2, 1, 3), 2, 1),   # sweep x; plane dims (z, y)
    1: ((0, 3, 1, 2), (0, 2, 3, 1), 2, 0),   # sweep y; plane dims (z, x)
}


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


def bake_light_volumes(volumes, light_dir, axis: int = 2):
    """volumes: [M, V, V, V] (z-major) densities.  light_dir: [3] unit
    vector toward the light.  axis: static world axis to sweep along
    (use ``dominant_axis(cfg.light.direction)``).
    Returns tau_raw [M, V, V, V] f32 in the original z-major layout."""
    perm, inv_perm, ci, cj = _SWEEPS[axis]
    M, V = volumes.shape[0], volumes.shape[-1]
    vols = volumes.astype(jnp.float32).transpose(perm)
    la = light_dir[axis]
    li, lj = light_dir[ci], light_dir[cj]
    ala = jnp.maximum(jnp.abs(la), MIN_LAXIS)
    # In-plane voxel drift of the path toward the light per one-voxel step
    # along the sweep axis, and the world path length per step for a
    # unit-cube volume.  The drift sign does NOT depend on sign(la): only
    # the sweep order and entry face do.
    dx = li / ala
    dy = lj / ala
    dl = (1.0 / (V - 1)) / ala

    # slice order: from the light-entry face inward.
    # la > 0 -> light enters at k = V-1, sweep k = V-1 .. 0
    ks_fwd = jnp.arange(V, dtype=jnp.int32)
    ks = jnp.where(la >= 0, V - 1 - ks_fwd, ks_fwd)

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

    # scatter the sweep order back to ascending storage: sweep index i
    # wrote slice ks[i]
    out = jnp.zeros((V, M, V, V), jnp.float32).at[ks].set(taus)
    return out.transpose(1, 0, 2, 3).transpose(inv_perm)  # [M, V, V, V]
