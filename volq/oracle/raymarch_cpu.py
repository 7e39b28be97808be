"""The CPU raymarch oracle — THE rendering semantics of record.

Per BASELINE.json:5 every device frame must match this renderer to 1e-3
per pixel.  It is written in plain numpy (float64 accumulation: the oracle
is the *mathematical* spec; the device's fp32 drift is absorbed by the
tolerance), structured to read top-to-bottom as the definition of a frame:

For each pixel (center (px+.5, py+.5), y down):
  1. generate a world ray (perspective or orthographic; see core/camera.py
     for the shared ndc conventions).
  2. For each ALIVE particle (age < lifetime) in ascending view-z order
     (stable sort on dot(pos - eye, fwd); the reference's depth sort, C3):
       a. slab-test the ray against the particle's cubic AABB
          [pos - size, pos + size]; segment is [max(t_enter, 0), t_exit];
          skip on empty segment.
       b. march ``steps`` midpoint samples t = t0 + (s + 0.5) * dt,
          dt = (t1 - t0) / steps.  At each sample:
            - local coords u = (x - (pos - size)) / (2 size) in [0,1]^3
            - density = trilinear(volume[vol_idx], u * (V-1))   (bf16 grid
              values widened; base cell floor clamped to [0, V-2])
            - sigma = density * density_scale * fade(age / lifetime) where
              fade(tau) = clip(min(tau/fade_in, (1-tau)/fade_out), 0, 1)
            - alpha = 1 - exp(-sigma * dt)
            - if light_steps > 0: from the sample point march
              ``light_steps`` midpoint samples toward the light to the AABB
              exit; tau_l = sum sigma_l * dl; atten = exp(-tau_l);
              else atten = 1.
            - radiance c = albedo * (light_color * atten + ambient)
            - composite front-to-back: C += T * alpha * c; T *= 1 - alpha
  3. output rgb = C + T * background, alpha = 1 - T.

There is deliberately no early-out: the fixed trip count is the spec.
"""
from __future__ import annotations

import numpy as np


def _fade(tau, fade_in, fade_out):
    fi = max(float(fade_in), 1e-6)
    fo = max(float(fade_out), 1e-6)
    return np.clip(np.minimum(tau / fi, (1.0 - tau) / fo), 0.0, 1.0)


def _ray_aabb(o, d, lo, hi):
    """Vectorized slab test. o, d: [..., 3]; lo, hi: [3]. Mirrors
    core/aabb.py: |d| clamped to >= 1e-12 keeping sign."""
    sign = np.where(d >= 0, 1.0, -1.0)
    d_safe = np.where(np.abs(d) < 1e-12, sign * 1e-12, d)
    inv = 1.0 / d_safe
    ta = (lo - o) * inv
    tb = (hi - o) * inv
    tmin = np.minimum(ta, tb).max(axis=-1)
    tmax = np.maximum(ta, tb).min(axis=-1)
    return np.maximum(tmin, 0.0), tmax


def _trilinear(vol, u):
    """vol: [V,V,V] float stored z-major (axes are z, x, y — a constant-z
    slice is vol[k]); u: [..., 3] local coords (x, y, z order) in [0,1].
    Mirrors core/interp.py."""
    V = vol.shape[0]
    g = u * (V - 1)
    i0 = np.clip(np.floor(g), 0, V - 2).astype(np.int64)
    f = np.clip(g - i0, 0.0, 1.0)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c = vol
    c000 = c[z0, x0, y0]
    c001 = c[z0 + 1, x0, y0]
    c010 = c[z0, x0, y0 + 1]
    c011 = c[z0 + 1, x0, y0 + 1]
    c100 = c[z0, x0 + 1, y0]
    c101 = c[z0 + 1, x0 + 1, y0]
    c110 = c[z0, x0 + 1, y0 + 1]
    c111 = c[z0 + 1, x0 + 1, y0 + 1]
    c00 = c000 + (c001 - c000) * fz
    c01 = c010 + (c011 - c010) * fz
    c10 = c100 + (c101 - c100) * fz
    c11 = c110 + (c111 - c110) * fz
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fx


def render_oracle(particles, volumes, camera, light, cfg, window=None):
    """Render a frame (or a pixel window) on the CPU.

    particles/camera/light: pytrees of arrays (converted to numpy float64).
    volumes: [M, V, V, V] (bf16 storage is widened here, exactly as the
    device path widens it).
    cfg: SceneConfig.
    window: optional (x0, y0, w, h) pixel crop.
    Returns [h, w, 4] float64 (rgb, alpha).
    """
    r = cfg.render
    W, H = r.width, r.height
    x0, y0, w, h = window if window is not None else (0, 0, W, H)

    f64 = lambda a: np.asarray(a, np.float64)
    pos, vel = f64(particles.pos), f64(particles.vel)
    age, lifetime = f64(particles.age), f64(particles.lifetime)
    size, albedo = f64(particles.size), f64(particles.albedo)
    vol_idx = np.asarray(particles.vol_idx, np.int64)
    vols = np.asarray(volumes, np.float32).astype(np.float64)
    V = vols.shape[-1]

    eye, right = f64(camera.eye), f64(camera.right)
    up, fwd = f64(camera.up), f64(camera.fwd)
    sx, sy = float(camera.scale_x), float(camera.scale_y)
    l_dir, l_col = f64(light.direction), f64(light.color)
    l_amb = f64(light.ambient)

    # --- rays ------------------------------------------------------------
    px, py = np.meshgrid(np.arange(x0, x0 + w), np.arange(y0, y0 + h))
    ndc_x = (px + 0.5) / W * 2.0 - 1.0
    ndc_y = 1.0 - (py + 0.5) / H * 2.0
    ox = ndc_x * sx
    oy = ndc_y * sy
    if cfg.camera.projection == "persp":
        d = fwd + ox[..., None] * right + oy[..., None] * up
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(eye, d.shape)
    else:
        o = eye + ox[..., None] * right + oy[..., None] * up
        d = np.broadcast_to(fwd, o.shape)

    # --- depth sort (alive only) -----------------------------------------
    alive = age < lifetime
    z = (pos - eye) @ fwd
    z = np.where(alive, z, np.inf)
    order = np.argsort(z, kind="stable")

    C = np.zeros((h, w, 3), np.float64)
    T = np.ones((h, w), np.float64)

    for pi in order:
        if not alive[pi]:
            break  # sorted: everything after the first dead one is dead
        half = size[pi]
        lo, hi = pos[pi] - half, pos[pi] + half
        t0, t1 = _ray_aabb(o, d, lo, hi)
        seg = t1 - t0
        hit = seg > 0
        if not hit.any():
            continue
        dt = seg / r.steps
        fade = _fade(age[pi] / lifetime[pi], r.fade_in, r.fade_out)
        if r.near_fade_start > 0.0:
            # camera-proximity fade, mirroring render/*'s _near_fade
            span = max(r.near_fade_start - r.near_fade_end, 1e-6)
            fade = fade * np.clip((z[pi] - r.near_fade_end) / span, 0.0, 1.0)
        scale = r.density_scale * fade
        vol = vols[vol_idx[pi]]

        for s in range(r.steps):
            t = t0 + (s + 0.5) * dt
            p = o + t[..., None] * d
            u = (p - lo) / (2.0 * half)
            sigma = _trilinear(vol, u) * scale
            alpha = np.where(hit, 1.0 - np.exp(-sigma * dt), 0.0)

            if r.light_steps > 0:
                lt0, lt1 = _ray_aabb(p, np.broadcast_to(l_dir, p.shape),
                                     lo, hi)
                dl = np.maximum(lt1, 0.0) / r.light_steps
                tau = np.zeros_like(alpha)
                for j in range(r.light_steps):
                    lp = p + ((j + 0.5) * dl)[..., None] * l_dir
                    ul = (lp - lo) / (2.0 * half)
                    tau += _trilinear(vol, ul) * scale * dl
                atten = np.exp(-tau)
            else:
                atten = np.ones_like(alpha)

            c = albedo[pi] * (l_col * atten[..., None] + l_amb)
            C += (T * alpha)[..., None] * c
            T *= 1.0 - alpha

    bg = np.asarray(cfg.render.background, np.float64)
    out = np.concatenate([C + T[..., None] * bg, (1.0 - T)[..., None]],
                         axis=-1)
    return out
