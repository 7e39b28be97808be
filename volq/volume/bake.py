"""Density-volume baking (SURVEY.md C4): fBm noise evaluated over a voxel
lattice, shaped by a radial falloff so each particle volume is a compact
"puff" whose density reaches zero before the AABB faces.

A scene owns a *bank* of M volumes [M, V, V, V]; each particle indexes one
(per-particle volumes = bank with M == N, shared volume = M == 1 — this is
how BASELINE configs 1/2 vs 3 differ).  Banks are baked on device, stored
bf16 (HBM bandwidth), and the oracle reads the identical bf16 grids, so
storage precision cancels in the 1e-3 frame diff.

The 4D animated variant (BASELINE.json:11) re-bakes per frame from a time
coordinate; it is the same lattice evaluation with perlin4.
"""
from __future__ import annotations

import jax.numpy as jnp

from volq.volume.noise import fbm3, fbm4, _hash_base, _u2f


def _lattice(size: int):
    """Local coords u (x, y, z order) of every voxel center, laid out
    z-major to match the renderers' volume convention (core/interp.py):
    array axes are (z, x, y), shape [V,V,V,3]."""
    ax = jnp.arange(size, dtype=jnp.float32) / (size - 1)
    uz, ux, uy = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([ux, uy, uz], axis=-1)


def _radius2(u):
    """Squared radius from the volume center, 1 at the inscribed sphere."""
    d = (u - 0.5) * 2.0
    return jnp.sum(d * d, axis=-1)


def _volume_offsets(ids, seed: int):
    """A deterministic world-offset per bank entry so entries differ.
    ``ids`` are global entry indices (a slice of them when the bake is
    sharded over a mesh)."""
    idx = jnp.asarray(ids, jnp.int32)
    off = jnp.stack(
        [_u2f(_hash_base(idx, idx * 7 + c, idx * 13 + 2 * c, seed + 101))
         for c in range(3)], axis=-1)
    return off * 64.0  # decorrelate entries by several noise periods


def _shape_density(n, u, cutoff: float, edge: float = 0.9):
    """Map fBm in [-1,1] to a carved puffy density in [0,1]: the radius
    raises the noise threshold, so the boundary is noise-carved (wispy)
    rather than a smooth sphere — and still reaches zero before the AABB
    faces (threshold >= cutoff + edge at the inscribed sphere)."""
    d = (jnp.maximum(0.0, 0.5 + 0.5 * n - (cutoff + edge * _radius2(u)))
         / max(1.0 - cutoff, 1e-3))
    return jnp.minimum(d, 1.0)


def bake_bank(bank_size: int, size: int, seed: int, *, octaves: int = 4,
              noise_scale: float = 4.0, cutoff: float = 0.3,
              edge: float = 0.9, dtype=jnp.bfloat16, ids=None):
    """Bake a static volume bank [M, V, V, V].  ``ids`` (default
    arange(bank_size)) selects which global bank entries to bake, so a mesh
    can shard the bake over entries and all_gather.

    Entries are baked with lax.map so peak memory is one entry's fp32
    intermediates, not the whole bank's (1024 x 128^3 lattices would be
    tens of GB otherwise); a V^3 lattice already saturates the VPU.
    """
    import jax

    u = _lattice(size)
    if ids is None:
        ids = jnp.arange(bank_size, dtype=jnp.int32)
    ids = jnp.asarray(ids, jnp.int32)

    def one(entry_id):
        off = _volume_offsets(entry_id[None], seed)[0]
        p = (u - 0.5) * noise_scale + off
        n = fbm3(p, seed, octaves=octaves)
        return _shape_density(n, u, cutoff, edge).astype(dtype)

    return jax.lax.map(one, ids)


def bake_bank_4d(bank_size: int, size: int, seed: int, t, *, octaves: int = 3,
                 noise_scale: float = 4.0, time_scale: float = 0.5,
                 cutoff: float = 0.3, edge: float = 0.9,
                 dtype=jnp.bfloat16, ids=None):
    """Bake a time-animated bank from 4D noise at simulation time ``t``."""
    import jax

    u = _lattice(size)
    if ids is None:
        ids = jnp.arange(bank_size, dtype=jnp.int32)
    ids = jnp.asarray(ids, jnp.int32)

    def one(entry_id):
        eid = entry_id[None]
        off = _volume_offsets(eid, seed)[0]
        xyz = (u - 0.5) * noise_scale + off
        w = jnp.broadcast_to(
            jnp.float32(t) * time_scale
            + _u2f(_hash_base(eid, eid * 3 + 1, eid * 5 + 2, seed + 202))[0]
            * 16.0,
            xyz.shape[:-1])
        p4 = jnp.concatenate([xyz, w[..., None]], axis=-1)
        n = fbm4(p4, seed, octaves=octaves)
        return _shape_density(n, u, cutoff, edge).astype(dtype)

    return jax.lax.map(one, ids)
