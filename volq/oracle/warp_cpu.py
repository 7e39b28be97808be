"""The CPU oracle for the WARP renderer (render/warp.py) — its sampling
semantics of record, held to the same 1e-3 per-pixel budget.

The warp engine's semantics (defined here, scalar and readable):

  Per particle, a [RP, RP] ray grid is marched: row w is the camera ray
  through pixel row (sy0 + w) at the particle's center column; column u
  is the ray whose "ray x-coordinate" rx_u equals that of pixel column
  (sx0 + u) at the particle's CENTER row (perspective: rx = slope dx/dz;
  orthographic: the ray's x-intercept at z = 0).  Marching quadrature is
  identical to the slab engine: ``steps`` planes at local z
  zeta_s = (s + .5)/steps, dt = min(ext/steps/|d_z|, slab-test segment),
  planes composited in the ray's near-to-far order, sample counted iff
  t > 0 and the in-plane coords lie inside the volume.

  A pixel (i, j) of the particle's rect takes the 1-D linear
  interpolation of the marched grid row j at u* = i + delta(i, j), where
  delta = (rx_pixel(i, j) - rx_u=i) / (rx_{i+1} - rx_i), clamped to
  [-K, K - 1e-3] (K = warp_shift_max).  Yawed/rolled cameras apply the
  symmetric row interpolation afterwards (render/warp.needs_row_fan).

  Particle images (premultiplied C, T) composite onto the frame in
  ascending view-z order (stable sort), front-to-back OVER — the same
  global order as raymarch_cpu.py, with per-particle rects clipped to
  [sx0, sx0+RP) x [sy0, sy0+RP).

All decisions that could flip discretely (rect origins, grid coordinates,
sampling positions, shift floors) are computed in float32 exactly like
the device; accumulation is float64.  With warp_fp32=False the device's
bf16 weight/slab/image quantization is mirrored via _q16.
"""
from __future__ import annotations

import numpy as np

from volq.oracle.raymarch_cpu import _fade
from volq.oracle.slab_cpu import _q16

_EPS = 1e-6
f32 = np.float32


def _ray_coords_np(camera, px, py, W, H, projection):
    """fp32 mirror of render/warp.ray_coords."""
    px = f32(px)
    py = f32(py)
    ndx = (px + f32(0.5)) / f32(W) * f32(2.0) - f32(1.0)
    ndy = f32(1.0) - (py + f32(0.5)) / f32(H) * f32(2.0)
    ox = ndx * f32(camera.scale_x)
    oy = ndy * f32(camera.scale_y)
    right = np.asarray(camera.right, np.float32)
    up = np.asarray(camera.up, np.float32)
    fwd = np.asarray(camera.fwd, np.float32)
    eye = np.asarray(camera.eye, np.float32)
    if projection == "persp":
        dx = fwd[0] + ox * right[0] + oy * up[0]
        dy = fwd[1] + ox * right[1] + oy * up[1]
        dz = fwd[2] + ox * right[2] + oy * up[2]
        dz = np.where(np.abs(dz) < _EPS,
                      np.where(dz >= 0, _EPS, -_EPS), dz).astype(f32)
        return (dx / dz).astype(f32), (dy / dz).astype(f32)
    o_x = eye[0] + ox * right[0] + oy * up[0]
    o_y = eye[1] + ox * right[1] + oy * up[1]
    o_z = eye[2] + ox * right[2] + oy * up[2]
    fz = fwd[2] if abs(float(fwd[2])) >= _EPS else \
        f32(_EPS if fwd[2] >= 0 else -_EPS)
    kx = f32(fwd[0] / fz)
    ky = f32(fwd[1] / fz)
    return (o_x - o_z * kx).astype(f32), (o_y - o_z * ky).astype(f32)


def _bilinear1d(row_vals, u, K):
    """1-D hat interpolation of row_vals at (already clamped) index u."""
    d0 = np.floor(u).astype(np.int64)
    d0 = np.clip(d0, 0, row_vals.shape[-1] - 2)
    fr = np.clip(u - d0, 0.0, 1.0)
    return row_vals[..., d0] * (1.0 - fr) + row_vals[..., d0 + 1] * fr


def render_warp_oracle(particles, volumes, camera, light, cfg,
                       light_volumes=None, y_start=0, h_local=None):
    """Render a frame (or row band) with warp semantics on the CPU.
    Returns [h_local, W, 4] float64."""
    r = cfg.render
    W, H = r.width, r.height
    if h_local is None:
        h_local = H
    if light_volumes is not None and r.light_steps <= 0:
        # mirror of render_warp/render_warp_canvas: light_steps <= 0
        # means unlit — the bake is dropped before any lit gating
        light_volumes = None
    RP = r.warp_rect
    K = r.warp_shift_max
    S = r.steps
    proj = cfg.camera.projection
    quant = not r.warp_fp32
    from volq.render.warp import (needs_row_fan, _march_perm, march_rect,
                                  upsample_weights)
    row_fan = needs_row_fan(cfg)
    RM = march_rect(cfg)
    centr = (light_volumes is not None) and r.light_mode == "center"
    MID = S // 2

    # rotate into engine coordinates for the static march axis (mirror of
    # render/warp.permute_for_march)
    vp, ap = _march_perm(cfg)
    if vp != (0, 1, 2):
        vp = list(vp)
        particles = particles._replace(pos=np.asarray(particles.pos)[:, vp])
        camera = camera._replace(
            eye=np.asarray(camera.eye)[vp],
            right=np.asarray(camera.right)[vp],
            up=np.asarray(camera.up)[vp],
            fwd=np.asarray(camera.fwd)[vp])
        volumes = np.asarray(volumes).transpose(ap)
        if light_volumes is not None:
            light_volumes = np.asarray(light_volumes).transpose(ap)

    f64 = lambda a: np.asarray(a, np.float64)
    pos = np.asarray(particles.pos, np.float32)
    age, lifetime = f64(particles.age), f64(particles.lifetime)
    size = np.asarray(particles.size, np.float32)
    albedo = f64(particles.albedo)
    vol_idx = np.asarray(particles.vol_idx, np.int64)
    # slab z-lerp happens in FLOAT32 on device (before any bf16 rounding):
    # keep the f32 volumes to mirror it exactly
    vols = np.asarray(volumes, np.float32)
    lvols = (None if light_volumes is None
             else np.asarray(light_volumes, np.float32))
    V = vols.shape[-1]
    gsc = f32(V - 1)
    N = pos.shape[0]
    # x-downsampled slab banks (render/warp.slab_vx_eff): the engine's
    # bake resamples the slab's x axis to VXe points by align-corners
    # fp32 lerp AFTER the fp32 z-lerp; the WxT hat weights then live on
    # the VXe grid (gscx).  Mirrored here with the same static (k0, fx)
    # constants and the same elementwise fp32 arithmetic.
    from volq.render.warp import slab_vx_eff, _slab_x_consts
    VXe = slab_vx_eff(cfg, V)
    gscx = f32(VXe - 1)
    if VXe != V:
        _xc = _slab_x_consts(VXe, V)
        kx_res = np.asarray([k for k, _ in _xc], np.int64)
        fx_res = np.asarray([f for _, f in _xc],
                            np.float32)[:, None]

    def _xres(slab32):
        """fp32 x-resample of one [V, V] z-lerped slab -> [VXe, V]."""
        if VXe == V:
            return slab32
        a = slab32[kx_res]
        return a + (slab32[kx_res + 1] - a) * fx_res

    eye = np.asarray(camera.eye, np.float32)
    right = np.asarray(camera.right, np.float32)
    up = np.asarray(camera.up, np.float32)
    fwd = np.asarray(camera.fwd, np.float32)
    sx, sy = f32(camera.scale_x), f32(camera.scale_y)
    l_col = f64(light.color)
    l_amb = f64(light.ambient)

    # ---- per-particle fp32 geometry (mirrors _grid_geometry) ----------
    rel = pos - eye
    vx = rel @ right
    vy = rel @ up
    vz = rel @ fwd
    if proj == "persp":
        vz_safe = np.maximum(vz, f32(1e-3))
        px_c = (vx / (vz_safe * sx) + f32(1.0)) * f32(0.5 * W)
        py_c = (f32(1.0) - vy / (vz_safe * sy)) * f32(0.5 * H)
        in_front = vz > 1e-3
        dzp = pos[:, 2] - eye[2]
        szn = np.where(dzp >= 0, 1.0, -1.0)
    else:
        px_c = (vx / sx + f32(1.0)) * f32(0.5 * W)
        py_c = (f32(1.0) - vy / sy) * f32(0.5 * H)
        in_front = np.ones_like(vz, bool)
        szn = np.full(N, 1.0 if fwd[2] >= 0 else -1.0)

    alive = np.asarray(particles.age) < np.asarray(particles.lifetime)

    sx0 = (np.round(px_c) - RP // 2).astype(np.int64)
    sy0 = (np.round(py_c) - RP // 2).astype(np.int64)
    on_screen = ((sx0 > -RP) & (sx0 < W)
                 & (sy0 > y_start - RP) & (sy0 < y_start + h_local))
    # straddlers render (front z-planes only, via the per-step tpos
    # test below — mirror of the device's straddle handling)
    valid = alive & in_front & on_screen
    if r.near_fade_start > 0.0:
        valid = valid & (vz > r.near_fade_end)

    z = np.where(valid, vz, np.inf)
    order = np.argsort(z, kind="stable")

    # cell-canvas modes (warp_coarse: cells = march cells;
    # warp_canvas_scale: cells at an arbitrary scale): composite at
    # CELL resolution, one bilinear cell->pixel upsample at the end —
    # mirror of the fused kernel's fractional-hat placement + the
    # device _canvas_finish (render/warp.py)
    coarse = bool(r.warp_coarse or r.warp_canvas_scale)
    if coarse:
        from volq.render.kernel import canvas_geom
        g = canvas_geom(cfg, h_local)
        ratio_c = f32(g.ratio)
        # march cells per canvas cell (the kernel's static C2M; exactly
        # 1.0 under warp_coarse)
        c2m = f32(np.float32((RM - 1) / max(RP - 1, 1))
                  / np.float32(g.ratio))
        hcT = g.pad + g.hc_img + g.pad + 2
        wcT = g.pad + g.wc_img + g.pad + 2
        C = np.zeros((3, hcT, wcT), np.float64)
        T = np.ones((hcT, wcT), np.float64)
    else:
        C = np.zeros((h_local, W, 3), np.float64)
        T = np.ones((h_local, W), np.float64)

    for pi in order:
        if not valid[pi]:
            continue
        RP_pi = RP
        # march-grid resolution (mirror of march_rect: RM < RP marches
        # an endpoint-aligned coarse grid, upsampled after the march)
        RM_pi = RM if RP_pi == RP else RP_pi
        uu = np.arange(RM_pi, dtype=np.float32) \
            * f32((RP_pi - 1) / max(RM_pi - 1, 1))
        half = f32(size[pi])
        ext = f32(2.0) * half
        lo = pos[pi] - half
        tau_life = age[pi] / max(lifetime[pi], 1e-6)
        fade = _fade(tau_life, r.fade_in, r.fade_out)
        if r.near_fade_start > 0.0:
            span = max(r.near_fade_start - r.near_fade_end, 1e-6)
            fade = fade * np.clip((float(vz[pi]) - r.near_fade_end) / span,
                                  0.0, 1.0)
        scale = r.density_scale * fade
        vol = vols[vol_idx[pi]]
        lvol = None if lvols is None else lvols[vol_idx[pi]]

        # grid ray coordinates (fp32 mirror)
        pxu = f32(sx0[pi]) + uu
        pyw = f32(sy0[pi]) + uu
        rx_u, _ = _ray_coords_np(camera, pxu,
                                 np.full(RM_pi, py_c[pi], f32) - f32(0.5),
                                 W, H, proj)
        _, ry_w = _ray_coords_np(camera,
                                 np.full(RM_pi, px_c[pi], f32) - f32(0.5),
                                 pyw, W, H, proj)

        # grid ray origins/directions (for dt, seg, tpos)
        rx2 = np.float64(1.0) * rx_u[None, :]             # [1,RP]
        ry2 = np.float64(1.0) * ry_w[:, None]             # [RP,1]
        if proj == "persp":
            rnorm = np.sqrt(rx2 * rx2 + ry2 * ry2 + 1.0)
            s3 = float(szn[pi])
            d = np.stack([rx2 / rnorm * s3,
                          np.broadcast_to(ry2 / rnorm, rnorm.shape) * s3,
                          np.broadcast_to(1.0 / rnorm, rnorm.shape) * s3],
                         axis=-1)
            o = np.broadcast_to(eye.astype(np.float64), d.shape)
            dt_raw = float(ext) / S * rnorm
        else:
            fz = float(fwd[2])
            fzs = fz if abs(fz) >= _EPS else (_EPS if fz >= 0 else -_EPS)
            kx, ky = float(fwd[0]) / fzs, float(fwd[1]) / fzs
            ez = float(eye[2])
            o = np.stack([np.broadcast_to(rx2 + ez * kx, (RP, RP)),
                          np.broadcast_to(ry2 + ez * ky, (RP, RP)),
                          np.full((RP, RP), ez)], axis=-1)
            d = np.broadcast_to(fwd.astype(np.float64), (RP, RP, 3))
            dt_raw = np.full((RP, RP), float(ext) / S / abs(fzs))
            s3 = float(szn[pi])

        sign = np.where(d >= 0, 1.0, -1.0)
        ds = np.where(np.abs(d) < 1e-12, sign * 1e-12, d)
        inv = 1.0 / ds
        lo64, hi64 = f64(lo), f64(pos[pi] + half)
        ta = (lo64 - o) * inv
        tb = (hi64 - o) * inv
        t0 = np.maximum(np.minimum(ta, tb).max(-1), 0.0)
        t1 = np.maximum(ta, tb).min(-1)
        seg = np.maximum(t1 - t0, 0.0)
        dt = np.minimum(dt_raw, seg)                       # [RP,RP]
        o_z = o[..., 2]

        # ---- march the grid (f64 accumulation, fp32 positions) -------
        Cf = np.zeros((3, RM_pi, RM_pi), np.float64)
        Cb = np.zeros((3, RM_pi, RM_pi), np.float64)
        Tp = np.ones((RM_pi, RM_pi), np.float64)
        od = np.zeros((RM_pi, RM_pi), np.float64)
        tau_mid = np.zeros((RM_pi, RM_pi), np.float64)
        # coarse per-step-lit mode composites from the factored (P1, P2)
        # planes (P1 = sum T*alpha*atten; P2 = 1 - T by telescoping) —
        # forward and backward accumulations mirror Cf/Cb
        p1f = np.zeros((RM_pi, RM_pi), np.float64)
        p1b = np.zeros((RM_pi, RM_pi), np.float64)
        for s in range(S):
            zeta = f32((s + 0.5) / S)
            gz = zeta * gsc
            z0 = int(np.clip(np.floor(gz), 0, V - 2))
            fz_ = float(np.clip(gz - z0, 0.0, 1.0))
            zw = f32(lo[2]) + zeta * ext                   # fp32 scalar
            # hoisted association (mirrors the device march):
            # gx = (c0 - lo)*k2 + (c1*k2)*rx, k2 = gsc/ext
            kx2o = gscx / ext
            ky2o = gsc / ext
            if proj == "persp":
                c1 = f32(zw) - eye[2]
                gx_u = (eye[0] - lo[0]) * kx2o + (c1 * kx2o) * rx_u
                gy_w = (eye[1] - lo[1]) * ky2o + (c1 * ky2o) * ry_w
            else:
                fzp = fwd[2] if abs(float(fwd[2])) >= _EPS else \
                    f32(_EPS if fwd[2] >= 0 else -_EPS)
                kxp, kyp = f32(fwd[0] / fzp), f32(fwd[1] / fzp)
                gx_u = (f32(zw) * kxp - lo[0]) * kx2o + kx2o * rx_u
                gy_w = (f32(zw) * kyp - lo[1]) * ky2o + ky2o * ry_w
            inx = (gx_u >= 0) & (gx_u <= gscx)
            iny = (gy_w >= 0) & (gy_w <= gsc)
            tpos = (float(zw) - o_z) * s3 > 0
            inb = iny[:, None] & inx[None, :] & tpos

            # fp32 z-lerp + fp32 x-resample, mirroring the device's bake
            # (then widened to f64)
            slab = f64(_xres(vol[z0] + (vol[z0 + 1] - vol[z0])
                             * f32(fz_)))
            gxc = np.clip(gx_u, 0, gscx)
            gyc = np.clip(gy_w, 0, gsc)
            sig = _bilin_grid(slab, gxc, gyc, quant)        # [RP(w),RP(u)]
            alpha = np.where(inb, 1.0 - np.exp(-sig * scale * dt), 0.0)
            if lvol is not None:
                lslab = f64(_xres(lvol[z0] + (lvol[z0 + 1] - lvol[z0])
                                  * f32(fz_)))
                tau = _bilin_grid(lslab, gxc, gyc, quant)
                atten = np.exp(-scale * float(ext)
                               * np.maximum(tau, 0.0))[None]
            else:
                atten = 1.0
            col = albedo[pi][:, None, None] * (l_col[:, None, None] * atten
                                               + l_amb[:, None, None])
            a3 = alpha[None]
            Cf = Cf + (Tp * alpha)[None] * col
            Cb = a3 * col + (1.0 - a3) * Cb
            if coarse and lvol is not None and not centr:
                att = atten[0] if isinstance(atten, np.ndarray) else atten
                p1f = p1f + (Tp * alpha) * att
                p1b = alpha * att + (1.0 - alpha) * p1b
            Tp = Tp * (1.0 - alpha)
            if lvol is None or centr:
                od = od + np.where(inb, sig, 0.0)
            if centr and s == MID:
                tau_mid = np.where(inb, tau, 0.0)

        # ---- planes at MARCH resolution (unlit: the LINEAR telescoped
        # optical depth q = od*scale*dt; lit: color + transmittance),
        # quantized at the march handoff like the device ---------------
        Cp = Cf if szn[pi] >= 0 else Cb
        unlit = lvol is None
        if unlit:
            planes = (od * scale * dt)[None]               # [1,RM,RM]
        elif centr:
            # center light mode: (q, tau') both LINEAR planes — one
            # light sample per ray at the particle's mid-depth step
            planes = np.stack([od * scale * dt,
                               (scale * float(ext))
                               * np.maximum(tau_mid, 0.0)])
        elif coarse:
            # per-step lit, coarse: the factored (P1, P2) planes (the
            # device kernel's representation in every fused mode)
            planes = np.stack([p1f if szn[pi] >= 0 else p1b, 1.0 - Tp])
        else:
            planes = np.concatenate([Cp, Tp[None]], axis=0)  # [4,RM,RM]
        if quant:
            planes = _q16(planes)

        # ---- fan correction at MARCH resolution, march-cell units
        # (fp32 mirror of warp.fan_shifts; Kc = K/ratio cell clamp) ----
        ratio = f32((RP_pi - 1) / max(RM_pi - 1, 1))
        Kc = float(K) / float(ratio)
        du, dw = _fan_shifts_np(camera, cfg, sx0[pi], sy0[pi],
                                px_c[pi], py_c[pi], RP_pi, row_fan,
                                RM=RM_pi)
        ii = np.arange(RM_pi, dtype=np.float32)
        # center mode: the smooth attenuation plane (tau') skips the
        # fan, mirroring the device kernel's bypass
        nf = 1 if centr else planes.shape[0]
        du = _edge_clamped_shift_np(du, Kc, RM_pi, ii[None, :])
        planes = np.concatenate(
            [_interp_cols(planes[:nf], ii[None, :] + du), planes[nf:]])
        if row_fan:
            dw = _edge_clamped_shift_np(dw, Kc, RM_pi, ii[:, None])
            planes = np.concatenate(
                [_interp_rows(planes[:nf], ii[:, None] + dw), planes[nf:]])

        # ---- unlit/center exps AT MARCH RESOLUTION (the upsampled
        # quantity is the saturated P1/P2, not the linear optical
        # depth — the classic reduced-resolution-impostor choice;
        # mirrors the device epilogue) ---------------------------------
        if unlit:
            planes = (1.0 - np.exp(-planes[0]))[None]      # (P2,)
        elif centr:
            P2m = 1.0 - np.exp(-planes[0])
            P1m = np.exp(-planes[1]) * P2m  # per-ray mid-depth atten
            planes = np.stack([P1m, P2m])

        if coarse:
            # ---- coarse placement: 2-tap hat placement of the (P1,
            # P2) planes at the FRACTIONAL cell position (ay, ax), then
            # OVER onto the march-cell canvas — mirror of the fused
            # kernel's coarse epilogue (render/kernel.py xplace/rmw).
            # The support is RM+1 cells per axis (the hat tent extends
            # a fraction past each end); outside it the placed planes
            # are exactly 0 = the OVER identity.
            pl_ = _q16(planes) if quant else planes
            ay = f32(g.pad) + (f32(sy0[pi]) - f32(y_start)) * ratio_c
            ax = f32(g.pad) + f32(sx0[pi]) * ratio_c
            cy0, cx0 = int(np.floor(ay)), int(np.floor(ax))
            sup = g.sup
            jv_ = np.arange(sup, dtype=np.float32)
            mv_ = np.arange(RM_pi, dtype=np.float32)
            Uy = np.maximum(
                0.0, 1.0 - np.abs((jv_[:, None] - f32(ay - cy0)) * c2m
                                  - mv_[None, :]))        # [sup, RM]
            Ux = np.maximum(
                0.0, 1.0 - np.abs((jv_[:, None] - f32(ax - cx0)) * c2m
                                  - mv_[None, :]))        # [sup, RM]
            if quant:
                Uy, Ux = _q16(Uy), _q16(Ux)
            t_ = np.einsum("jm,pmk->pjk", f64(Uy), f64(pl_))
            if quant:
                t_ = _q16(t_)
            placed = np.einsum("pjk,ik->pji", t_, f64(Ux))
            P2p = placed[-1]
            P1p = placed[0]
            if unlit:
                c1v = albedo[pi] * (l_col + l_amb)   # single-coef form
                c2v = np.zeros(3)
            else:
                c1v = albedo[pi] * l_col
                c2v = albedo[pi] * l_amb
            Tw = T[cy0:cy0 + sup, cx0:cx0 + sup]
            T1 = Tw * P1p
            T2 = Tw * P2p
            upd = c1v[:, None, None] * T1 + c2v[:, None, None] * T2
            Cn = C[:, cy0:cy0 + sup, cx0:cx0 + sup] + upd
            Tn = Tw - T2
            if not r.warp_canvas_fp32:
                Cn = _q16(Cn)
                Tn = _q16(Tn)
            C[:, cy0:cy0 + sup, cx0:cx0 + sup] = Cn
            T[cy0:cy0 + sup, cx0:cx0 + sup] = Tn
            continue

        # ---- hat-upsample march grid -> rect (mirror of the kernel
        # epilogue, same quantization points in quant mode) ------------
        if RM_pi != RP_pi:
            Uy, Ux = upsample_weights(RP_pi, RM_pi)
            if quant:
                Uy, Ux = _q16(Uy), _q16(Ux)
            p_ = _q16(planes) if quant else planes
            t_ = np.einsum("im,pmk->pik", f64(Uy), f64(p_))
            if quant:
                t_ = _q16(t_)
            planes = np.einsum("pik,kj->pij", t_, f64(Ux))

        if unlit:
            # atten == 1 makes the color a constant multiple of P2
            P2 = planes[0]
            colc = albedo[pi][:, None, None] \
                * (l_col + l_amb)[:, None, None]
            img = np.concatenate([colc * P2[None], (1.0 - P2)[None]],
                                 axis=0)                   # [4,RP,RP]
        elif centr:
            P1, P2 = planes
            Cc = albedo[pi][:, None, None] * (l_col[:, None, None]
                                              * P1[None]
                                              + l_amb[:, None, None]
                                              * P2[None])
            img = np.concatenate([Cc, (1.0 - P2)[None]], axis=0)
        else:
            img = planes
        if quant:
            img = _q16(img)

        # ---- composite the rect onto the frame ------------------------
        x0, y0 = int(sx0[pi]), int(sy0[pi]) - int(y_start)
        fx0, fy0 = max(x0, 0), max(y0, 0)
        fx1, fy1 = min(x0 + RP_pi, W), min(y0 + RP_pi, h_local)
        if fx1 <= fx0 or fy1 <= fy0:
            continue
        wi = img[:, fy0 - y0:fy1 - y0, fx0 - x0:fx1 - x0]
        Tw = T[fy0:fy1, fx0:fx1]
        Cn = C[fy0:fy1, fx0:fx1] + (Tw[None] * wi[:3]).transpose(1, 2, 0)
        Tn = Tw * wi[3]
        if not r.warp_canvas_fp32:
            # the device stores the canvas bf16: mirror the per-particle
            # rounding of the updated window
            Cn = _q16(Cn)
            Tn = _q16(Tn)
        C[fy0:fy1, fx0:fx1] = Cn
        T[fy0:fy1, fx0:fx1] = Tn

    bg = np.asarray(r.background, np.float64)
    if coarse:
        # mirror of render/warp._canvas_finish's coarse path: crop the
        # cell canvas to the image extent and bilinear-upsample to
        # pixels (weight positions computed in f32 like the device)
        Cc = C[:, g.pad:g.pad + g.hc_img, g.pad:g.pad + g.wc_img]
        Tc = T[g.pad:g.pad + g.hc_img, g.pad:g.pad + g.wc_img]

        def up_w(P, Cn):
            pos = (np.arange(P, dtype=np.float32)[:, None]
                   * ratio_c)
            cc_ = np.arange(Cn, dtype=np.float32)[None, :]
            return np.maximum(0.0, 1.0 - np.abs(pos - cc_))

        Fy = f64(up_w(h_local, g.hc_img))
        Fx = f64(up_w(W, g.wc_img))
        Ci = np.einsum("ph,khw,qw->pqk", Fy, Cc, Fx)
        Ti = np.einsum("ph,hw,qw->pq", Fy, Tc, Fx)
        return np.concatenate([Ci + Ti[..., None] * bg,
                               (1.0 - Ti)[..., None]], axis=-1)
    return np.concatenate([C + T[..., None] * bg, (1.0 - T)[..., None]],
                          axis=-1)


def _bilin_grid(slab, gx_u, gy_w, quant):
    """Separable bilinear, mirroring the device's two contractions
    INCLUDING the intermediate rounding: pass 1 resamples the slab along
    y (the Wy @ slab contraction, f32 accumulation, then cast to the
    working dtype); pass 2 contracts with the Wx hat weights.  With
    ``quant`` every stored tensor (slab, weights, the pass-1 result) is
    bf16-rounded exactly as on device.  out[w, u]."""
    Vx, Vy = slab.shape            # [x (maybe downsampled), y]
    x0 = np.clip(np.floor(gx_u), 0, Vx - 2).astype(np.int64)
    y0 = np.clip(np.floor(gy_w), 0, Vy - 2).astype(np.int64)
    fx = np.clip(gx_u - x0, 0.0, 1.0)
    fy = np.clip(gy_w - y0, 0.0, 1.0)
    if quant:
        slab = _q16(slab)
        w0x, w1x = _q16(1.0 - fx), _q16(fx)
        w0y, w1y = _q16(1.0 - fy), _q16(fy)
    else:
        w0x, w1x = 1.0 - fx, fx
        w0y, w1y = 1.0 - fy, fy
    # pass 1: t1[w, a] = sum_b slab[a, b] * hat(gy_w - b)
    t1 = (slab[:, y0] * w0y + slab[:, y0 + 1] * w1y).T      # [w, a]
    if quant:
        t1 = _q16(t1)
    # pass 2: out[w, u] = sum_a t1[w, a] * hat(gx_u - a)
    return t1[:, x0] * w0x + t1[:, x0 + 1] * w1x


def _safe_div_np(num, den):
    sgn = np.where(den >= 0, f32(1.0), f32(-1.0))
    return (num / (sgn * np.maximum(np.abs(den), f32(1e-12)))).astype(f32)


def _fan_shifts_np(camera, cfg, sx0, sy0, px_c, py_c, RP, row_fan,
                   RM=None):
    """fp32 mirror of render/warp.fan_shifts (closed, cancellation-free
    form) for ONE particle — evaluated at the RM march positions, in
    march-cell units.  Returns (du [RM,RM], dw [RM,RM] or None)."""
    if RM is None:
        RM = RP
    ratio = f32((RP - 1) / max(RM - 1, 1))
    r = cfg.render
    W, H = f32(r.width), f32(r.height)
    proj = cfg.camera.projection
    right = np.asarray(camera.right, np.float32)
    up = np.asarray(camera.up, np.float32)
    fwd = np.asarray(camera.fwd, np.float32)
    sx, sy = f32(camera.scale_x), f32(camera.scale_y)
    dox_step = f32(2.0) * sx / W * ratio
    doy_step = f32(-2.0) * sy / H * ratio

    iv = (np.arange(RM, dtype=np.float32) * ratio)[None, :]  # [1, RM]
    jv = (np.arange(RM, dtype=np.float32) * ratio)[:, None]  # [RM, 1]
    sx0f, sy0f = f32(sx0), f32(sy0)
    doy_j = (f32(py_c) - (sy0f + jv + f32(0.5))) * (f32(2.0) * sy / H)
    dox_i = ((sx0f + iv + f32(0.5)) - f32(px_c)) * (f32(2.0) * sx / W)

    if proj == "ortho":
        fz = fwd[2] if abs(float(fwd[2])) >= _EPS else \
            f32(_EPS if fwd[2] >= 0 else -_EPS)
        kx, ky = f32(fwd[0] / fz), f32(fwd[1] / fz)
        Ax = right[0] - right[2] * kx
        Bx = up[0] - up[2] * kx
        du = np.broadcast_to(_safe_div_np(doy_j * Bx, dox_step * Ax),
                             (RM, RM)).astype(f32)
        if not row_fan:
            return du, None
        Ay = right[1] - right[2] * ky
        By = up[1] - up[2] * ky
        dw = np.broadcast_to(_safe_div_np(dox_i * Ay, doy_step * By),
                             (RM, RM)).astype(f32)
        return du, dw

    ox_i = ((sx0f + iv + f32(0.5)) * (f32(2.0) / W) - f32(1.0)) * sx
    oy_c = (f32(1.0) - f32(py_c) * (f32(2.0) / H)) * sy
    D_ic = fwd[2] + ox_i * right[2] + oy_c * up[2]         # [1, RP]
    Nx_ic = fwd[0] + ox_i * right[0] + oy_c * up[0]
    Fy_i = up[0] * D_ic - Nx_ic * up[2]
    Gx_i = right[0] * D_ic - Nx_ic * right[2]
    D_ip1 = D_ic + dox_step * right[2]
    D_ij = (D_ic + doy_j * up[2]).astype(f32)              # [RP, RP]
    # per-column rational factor hoisted to 1-D (mirror of the device
    # epilogue: only D_ij genuinely varies in 2-D)
    A_i = _safe_div_np(Fy_i * D_ip1, dox_step * Gx_i)      # [1, RP]
    du = _safe_div_np(doy_j * A_i, D_ij)
    if not row_fan:
        return du, None
    oy_j = (f32(1.0) - (sy0f + jv + f32(0.5)) * (f32(2.0) / H)) * sy
    ox_c = (f32(px_c) * (f32(2.0) / W) - f32(1.0)) * sx
    D_cj = fwd[2] + oy_j * up[2] + ox_c * right[2]         # [RP, 1]
    Ny_cj = fwd[1] + oy_j * up[1] + ox_c * right[1]
    Fx_j = right[1] * D_cj - Ny_cj * right[2]
    Gy_j = up[1] * D_cj - Ny_cj * up[2]
    D_jp1 = D_cj + doy_step * up[2]
    D_ij2 = (D_cj + dox_i * right[2]).astype(f32)
    B_j = _safe_div_np(Fx_j * D_jp1, doy_step * Gy_j)      # [RP, 1]
    dw = _safe_div_np(dox_i * B_j, D_ij2)
    return du, dw


def _edge_clamped_shift_np(raw, K, RP, axis_idx):
    """fp32 mirror of render/warp._edge_clamped_shift."""
    du = np.clip(raw.astype(f32), f32(-K), f32(K - 1e-3))
    du = np.maximum(du, -axis_idx)
    du = np.minimum(du, f32(RP - 1.0 - 1e-3) - axis_idx)
    return du


def _interp_cols(img, u_star):
    """img [4, RP, RP(u)]; u_star [RP(j), RP(i)] -> [4, RP, RP]."""
    RP = img.shape[-1]
    u0 = np.clip(np.floor(u_star), 0, RP - 2).astype(np.int64)
    fr = np.clip(u_star - u0, 0.0, 1.0)
    jj = np.arange(RP)[:, None]
    out = (img[:, jj, u0] * (1.0 - fr) + img[:, jj, u0 + 1] * fr)
    return out


def _interp_rows(img, w_star):
    """img [4, RP(w), RP]; w_star [RP(j), RP(i)] -> [4, RP, RP]."""
    RP = img.shape[1]
    w0 = np.clip(np.floor(w_star), 0, RP - 2).astype(np.int64)
    fr = np.clip(w_star - w0, 0.0, 1.0)
    ii = np.arange(RP)[None, :]
    out = (img[:, w0, ii] * (1.0 - fr) + img[:, w0 + 1, ii] * fr)
    return out
