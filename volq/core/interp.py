"""Trilinear sampling of 3D density grids (SURVEY.md C2/C4).

The voxel convention of record (mirrored in the oracle): a volume is a
[V, V, V] grid of samples at positions u * (V - 1) for local coordinates
u in [0, 1]^3, stored z-major — the array is [V_z, V_x, V_y] and element
(x, y, z) lives at lin = (z * V + x) * V + y, so a constant-z slice is
contiguous (what the slab renderer marches).  The base cell index is
floor(g) clamped to [0, V-2] and the fractional weights are clamped to
[0, 1], so queries are well-defined slightly outside the box.

TPU note: per-sample fetches use XLA's native gather HLO (jnp.take on a
flat bank), which lowers to a scalar-driven loop at ~1e8 fetches/s on v5e
(no hardware gather; docs/DESIGN.md §1) — fine for the semantics-of-record
exact engine, far too slow for the hot path, which is why render/slab.py
reformulates sampling as MXU contractions.  In-Pallas gathers do not lower
in this toolchain (docs/DESIGN.md). Volumes are stored bf16 (HBM bandwidth)
and widened to fp32 before the interpolation arithmetic; the oracle reads
the identical bf16 grid values, so storage precision cancels in the diff.
"""
from __future__ import annotations

import jax.numpy as jnp


def trilinear_weights(u, size: int):
    """Corner indices and weights for local coords u [..., 3].

    Returns (i0 [..., 3] int32, f [..., 3] f32): base cell and fractions.
    """
    g = u.astype(jnp.float32) * (size - 1)
    i0 = jnp.clip(jnp.floor(g), 0, size - 2).astype(jnp.int32)
    f = jnp.clip(g - i0.astype(jnp.float32), 0.0, 1.0)
    return i0, f


def sample_bank_trilinear(bank2d, size: int, vol, u):
    """Trilinearly sample per-point volumes from a bank.

    bank2d: [M, V^3] density values (any float dtype; math in fp32).  The
            2-D layout keeps both gather indices within int32 even when
            M * V^3 reaches 2^31 (1024 particles x 128^3 does exactly).
            Volume linearization is z-major: element (x, y, z) lives at
            (z * V + x) * V + y — i.e. the volume is [V_z, V_x, V_y], so a
            constant-z slice is contiguous (what the slab renderer marches).
    size:   V (static).
    vol:    [...] int32, per-point volume index (bank row).
    u:      [..., 3] f32 local coordinates in [0, 1]^3 (x, y, z order).
    Returns [...] f32 densities.
    """
    V = size
    i0, f = trilinear_weights(u, V)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    lin000 = (z0 * V + x0) * V + y0

    def fetch(off):
        return bank2d[vol, lin000 + off].astype(jnp.float32)

    # Corner offsets in the z-major linearization: +1 => y+1, +V => x+1,
    # +V^2 => z+1.
    c000 = fetch(0)            # (x0, y0, z0)
    c001 = fetch(V * V)        # z+1
    c010 = fetch(1)            # y+1
    c011 = fetch(V * V + 1)
    c100 = fetch(V)            # x+1
    c101 = fetch(V * V + V)
    c110 = fetch(V + 1)
    c111 = fetch(V * V + V + 1)

    c00 = c000 + (c001 - c000) * fz
    c01 = c010 + (c011 - c010) * fz
    c10 = c100 + (c101 - c100) * fz
    c11 = c110 + (c111 - c110) * fz
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fx
