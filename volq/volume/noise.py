"""Hash-gradient (Perlin-style) 3D/4D noise + fBm, in pure jnp (SURVEY.md C4).

All hashing is exact uint32 arithmetic (wrapping multiplies/xors/shifts), so
the noise field is bit-identical across CPU and TPU backends; the floating
point gradient math is fp32.  The 4D variant provides the time-animated
density of BASELINE config 5 (BASELINE.json:11).

Everything here is elementwise VPU work with zero gathers — ideal XLA
fusion food; the bake (volume/bake.py) evaluates it over a voxel lattice
on device.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32

# Large odd constants (xxhash/murmur-style mixing).
_K1 = jnp.uint32(0x8DA6B343)
_K2 = jnp.uint32(0xD8163841)
_K3 = jnp.uint32(0xCB1AB31F)
_K4 = jnp.uint32(0x165667B1)
_KSEED = jnp.uint32(0x9E3779B9)
_M1 = jnp.uint32(0x85EBCA6B)
_M2 = jnp.uint32(0xC2B2AE35)


def _mix(h):
    h = h ^ (h >> 13)
    h = h * _M1
    h = h ^ (h >> 16)
    h = h * _M2
    h = h ^ (h >> 15)
    return h


def _hash_base(ix, iy, iz, seed, iw=None):
    h = (ix.astype(_U32) * _K1) ^ (iy.astype(_U32) * _K2) \
        ^ (iz.astype(_U32) * _K3) ^ (jnp.uint32(seed) * _KSEED)
    if iw is not None:
        h = h ^ (iw.astype(_U32) * _K4)
    return _mix(h)


def _u2f(h):
    """uint32 -> f32 in [-1, 1)."""
    return h.astype(jnp.float32) * jnp.float32(2.0 / 4294967296.0) - 1.0


def _fade(t):
    """Perlin smootherstep 6t^5 - 15t^4 + 10t^3."""
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad_dot3(ix, iy, iz, seed, dx, dy, dz):
    """Dot of the lattice gradient at integer corner (ix,iy,iz) with the
    offset (dx,dy,dz). Gradient components are independent hashes in [-1,1)."""
    h = _hash_base(ix, iy, iz, seed)
    gx = _u2f(h)
    gy = _u2f(_mix(h ^ _K1))
    gz = _u2f(_mix(h ^ _K2))
    return gx * dx + gy * dy + gz * dz


def perlin3(p, seed: int):
    """3D gradient noise. p: [..., 3] f32. Returns [...] f32, roughly [-1,1]."""
    pf = jnp.floor(p)
    pi = pf.astype(jnp.int32)
    f = (p - pf).astype(jnp.float32)
    ix, iy, iz = pi[..., 0], pi[..., 1], pi[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    wx, wy, wz = _fade(fx), _fade(fy), _fade(fz)

    def corner(cx, cy, cz):
        return _grad_dot3(ix + cx, iy + cy, iz + cz, seed,
                          fx - cx, fy - cy, fz - cz)

    n000, n001 = corner(0, 0, 0), corner(0, 0, 1)
    n010, n011 = corner(0, 1, 0), corner(0, 1, 1)
    n100, n101 = corner(1, 0, 0), corner(1, 0, 1)
    n110, n111 = corner(1, 1, 0), corner(1, 1, 1)

    n00 = n000 + (n001 - n000) * wz
    n01 = n010 + (n011 - n010) * wz
    n10 = n100 + (n101 - n100) * wz
    n11 = n110 + (n111 - n110) * wz
    n0 = n00 + (n01 - n00) * wy
    n1 = n10 + (n11 - n10) * wy
    return n0 + (n1 - n0) * wx


def _grad_dot4(ix, iy, iz, iw, seed, dx, dy, dz, dw):
    h = _hash_base(ix, iy, iz, seed, iw)
    gx = _u2f(h)
    gy = _u2f(_mix(h ^ _K1))
    gz = _u2f(_mix(h ^ _K2))
    gw = _u2f(_mix(h ^ _K3))
    return gx * dx + gy * dy + gz * dz + gw * dw


def perlin4(p, seed: int):
    """4D gradient noise. p: [..., 4] f32 (xyz + time). Returns [...] f32."""
    pf = jnp.floor(p)
    pi = pf.astype(jnp.int32)
    f = (p - pf).astype(jnp.float32)
    ix, iy, iz, iw = pi[..., 0], pi[..., 1], pi[..., 2], pi[..., 3]
    fx, fy, fz, fw = f[..., 0], f[..., 1], f[..., 2], f[..., 3]
    wx, wy, wz, ww = _fade(fx), _fade(fy), _fade(fz), _fade(fw)

    def corner(cx, cy, cz, cw):
        return _grad_dot4(ix + cx, iy + cy, iz + cz, iw + cw, seed,
                          fx - cx, fy - cy, fz - cz, fw - cw)

    def lerp(a, b, w):
        return a + (b - a) * w

    # Interpolate over w first, then z, y, x (16 corners).
    n = [None] * 8
    for i, (cx, cy, cz) in enumerate(
            [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]):
        n[i] = lerp(corner(cx, cy, cz, 0), corner(cx, cy, cz, 1), ww)
    n000, n001, n010, n011, n100, n101, n110, n111 = n
    n00 = lerp(n000, n001, wz)
    n01 = lerp(n010, n011, wz)
    n10 = lerp(n100, n101, wz)
    n11 = lerp(n110, n111, wz)
    n0 = lerp(n00, n01, wy)
    n1 = lerp(n10, n11, wy)
    return lerp(n0, n1, wx)


def fbm3(p, seed: int, *, octaves: int = 4, lacunarity: float = 2.0,
         gain: float = 0.5):
    """Fractal Brownian motion over perlin3, normalized to roughly [-1, 1]."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    amp, freq, norm = 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * perlin3(p * freq, seed + o)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm


def fbm4(p, seed: int, *, octaves: int = 4, lacunarity: float = 2.0,
         gain: float = 0.5):
    """Fractal Brownian motion over perlin4."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    amp, freq, norm = 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * perlin4(p * freq, seed + o)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm
