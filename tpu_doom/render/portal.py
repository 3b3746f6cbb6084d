"""Portal (column) renderer: the 2.5D fast path.

At zero pitch, Doom walls are screen-vertical and flats are horizontal
planes, so visibility per screen column reduces to a front-to-back walk
over the column's ray/seg crossings (classic Doom's approach, reformulated
for lockstep SPMD):

  1. intersect each column's ray with every seg (W x S, vectorized),
  2. sort crossings by depth, keep the nearest K,
  3. walk the K crossings per column carrying a vertical clip window,
     emitting WINDOW-CLIPPED span records (ceiling/floor flats, sky bands,
     upper/lower/middle wall pieces) -- at most 7 per crossing,
  4. classify each pixel by its first matching record and shade with the
     same combined colormapped atlas as the triangle path.

Work per env is W*S crossing math + P*(7K) classification -- independent
of triangle count, vs the rasterizer's P*T (a ~100x reduction at real-WAD
scale). Masked middles (transparent walls) and sprites are non-occluding
and drawn by a small triangle-path pass depth-merged over the portal
output.

Restrictions (documented; the triangle path remains the general oracle):
  * pitch must be ~0 (the walk assumes screen-vertical walls; DoomSim
    raises otherwise via config choice, it does not silently degrade),
  * single-level scenes (no LevelBank integration yet).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..sim.lights import light_table_u8
from ..utils.config import GameConfig
from .raster_jnp import (
    PASS_DECOR,
    PASS_WALL,
    _anim_atlas_uv,
    _peel_layers_jnp,
    _pixel_grid,
    _prepare_env,
    _scene_triangles,
)

INF = jnp.float32(jnp.inf)

# Record channel layout.
R_Y0, R_Y1, R_KIND, R_P0 = 0, 1, 2, 3
R_AX, R_AY, R_TSX, R_TSY, R_ROWH, R_FRAMES = 4, 5, 6, 7, 8, 9
R_LIGHT, R_W, R_T1, R_T2, R_LOW, R_HIGH = 10, 11, 12, 13, 14, 15
NCH = 16
KIND_NONE, KIND_FLAT, KIND_WALL, KIND_SKY = 0.0, 1.0, 2.0, 3.0
RECORDS_PER_CROSSING = 7


def portal_scene_from_table(table, arrays=None) -> dict:
    """PortalTable (numpy dataclass) -> dict pytree of jnp arrays. When the
    LevelArrays are provided, also precomputes the static index list of
    masked triangles (transparent walls + decor) in the combined triangle
    list, so the masked pass peels a handful of triangles instead of T."""
    import numpy as np

    out = {
        f.name: jnp.asarray(getattr(table, f.name))
        for f in dataclasses.fields(table)
    }
    if arrays is not None:
        tf = len(arrays.flat_tris)
        tw = len(arrays.wall_tris)
        td = len(arrays.decor_tris)
        wall_ids = tf + np.nonzero(arrays.wall_tri_transparent)[0]
        decor_ids = tf + tw + np.arange(td)
        masked = np.concatenate([wall_ids, decor_ids]).astype(np.int32)
        if masked.size == 0:
            masked = np.zeros((0,), np.int32)
        out["masked_ids"] = jnp.asarray(masked)
    return out


def _render_env_portal(pt, scene, cfg, width, height, n_cross,
                       pos, yaw, pitch, object_offset, time):
    pcfg = cfg.player
    H, W = height, width
    f = 1.0 / jnp.tan(jnp.float32(math.radians(cfg.fov)) / 2.0)
    aspect = (W / H) * pcfg.aspect_ratio_correction
    p00 = f / aspect
    p11 = f

    # Camera (pitch treated as zero; see module docstring).
    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
    cam = pos + jnp.array([0.0, pcfg.camera_height, 0.0], jnp.float32)
    cx, cyw, cz = cam[0], cam[1], cam[2]
    # look = R_y(yaw) @ (0,0,-1); right = R_y(yaw) @ (1,0,0)   (camera.py)
    fwd = jnp.stack([-sy_, -cy_])  # XZ
    right = jnp.stack([cy_, -sy_])

    i = jnp.arange(W, dtype=jnp.float32) + 0.5
    ndc_x = 2.0 * i / W - 1.0
    xv = ndc_x / p00
    d = fwd[None, :] + right[None, :] * xv[:, None]  # (W, 2); depth == t

    lights_f = light_table_u8(scene, time).astype(jnp.float32) / 255.0

    # --- crossings (W x S) -----------------------------------------------
    p1, p2 = pt["p1"], pt["p2"]  # (S, 2)
    e = p2 - p1
    o = jnp.stack([cx, cz])
    po = p1 - o[None, :]  # (S, 2)
    denom = d[:, None, 0] * e[None, :, 1] - d[:, None, 1] * e[None, :, 0]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    t = (po[None, :, 0] * e[None, :, 1] - po[None, :, 1] * e[None, :, 0]) / safe
    u = (po[None, :, 0] * d[:, None, 1] - po[None, :, 1] * d[:, None, 0]) / safe
    # Front-facing: the quad's front side must face the ray (same cull as
    # the rasterizer's backface test).
    facing = denom > 0.0
    valid = (
        (jnp.abs(denom) >= 1e-12)
        & facing
        & (t > pcfg.near)
        & (t < pcfg.far)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    td = jnp.where(valid, t, INF)
    order = jnp.argsort(td, axis=1)[:, :n_cross]  # (W, K)
    t_k = jnp.take_along_axis(td, order, axis=1)
    u_k = jnp.take_along_axis(u, order, axis=1)

    def row_of(h, tt):
        """Continuous image-row of world height h at depth tt."""
        ndc_y = p11 * (h - cyw) / tt
        return H - (ndc_y + 1.0) * 0.5 * H

    def g(name, idx):
        return pt[name][idx]

    off = lambda obj_idx: object_offset[obj_idx]

    def resolve_atlas6(a6):
        """Animation frame select on a (W, 6) bounds block (flats use the
        flats-plane width; walls the walls plane)."""
        return a6  # resolved per kind below

    def anim_base(a6, atlas_w):
        base = a6[:, 0:2]
        ts = a6[:, 2:4]
        row_h = a6[:, 4]
        frames = a6[:, 5].astype(jnp.int32)
        out = _anim_atlas_uv(base, ts, row_h, frames, atlas_w, time)
        return out, ts

    flats_w = float(scene.flats_atlas.shape[1])
    walls_w = float(scene.walls_atlas_index.shape[1])

    # --- the walk ---------------------------------------------------------
    top = jnp.zeros((W,), jnp.float32)
    bot = jnp.full((W,), float(H), jnp.float32)
    done = jnp.zeros((W,), bool)
    recs = []  # each: (NCH, W)

    def rec(y0, y1, kind, p0=0.0, a6=None, light=0.0, w=0.0,
            t1=0.0, t2=0.0, low=0.0, high=0.0, ok=None):
        ch = [None] * NCH
        zero = jnp.zeros((W,), jnp.float32)
        live = ok if ok is not None else jnp.ones((W,), bool)
        y0 = jnp.where(live, y0, 1e9)
        y1 = jnp.where(live, y1, -1e9)
        ch[R_Y0], ch[R_Y1] = y0, y1
        ch[R_KIND] = jnp.where(live, kind, KIND_NONE) + zero
        ch[R_P0] = p0 + zero
        if a6 is None:
            for c in range(R_AX, R_FRAMES + 1):
                ch[c] = zero
        else:
            base, ts = a6
            ch[R_AX], ch[R_AY] = base[:, 0], base[:, 1]
            ch[R_TSX], ch[R_TSY] = ts[:, 0], ts[:, 1]
            ch[R_ROWH] = zero
            ch[R_FRAMES] = zero
        ch[R_LIGHT] = light + zero
        ch[R_W] = w + zero
        ch[R_T1] = t1 + zero
        ch[R_T2] = t2 + zero
        ch[R_LOW] = low + zero
        ch[R_HIGH] = high + zero
        recs.append(jnp.stack(ch))

    hmin, hmax = pt["hmin"], pt["hmax"]

    for k in range(n_cross):
        idx = order[:, k]
        t = t_k[:, k]
        live = jnp.isfinite(t) & ~done
        has_back = g("has_back", idx) & live

        fc = g("f_ceil", idx) + off(g("f_ceil_obj", idx))
        ff = g("f_floor", idx) + off(g("f_floor_obj", idx))
        fcs = g("f_ceil_sky", idx)
        ffs = g("f_floor_sky", idx)
        light_flat = lights_f[jnp.clip(g("flat_light", idx), 0, lights_f.shape[0] - 1)]

        safe_t = jnp.where(live, t, 1.0)
        r_fc = jnp.where(fcs, row_of(hmax, safe_t), row_of(fc, safe_t))
        r_ff = jnp.where(ffs, row_of(hmin, safe_t), row_of(ff, safe_t))

        # Ceiling span [top, min(bot, r_fc)): front sector ceiling (or sky).
        # Sky ceilings are planes at hmax (the reference's sky polys), which
        # also gives the masked/sprite merge the true GL depth.
        ca = anim_base(g("ceil_atlas", idx), flats_w)
        rec(top, jnp.minimum(bot, r_fc),
            jnp.where(fcs, KIND_SKY, KIND_FLAT),
            p0=jnp.where(fcs, hmax, fc), a6=ca,
            light=light_flat, ok=live)
        # Floor span [max(top, r_ff), bot).
        fa = anim_base(g("floor_atlas", idx), flats_w)
        rec(jnp.maximum(top, r_ff), bot,
            jnp.where(ffs, KIND_SKY, KIND_FLAT),
            p0=jnp.where(ffs, hmin, ff), a6=fa,
            light=light_flat, ok=live)

        top1 = jnp.maximum(top, r_fc)
        bot1 = jnp.minimum(bot, r_ff)

        # Sky bands at sky->nonsky boundaries (walker sky quads).
        bcs = g("b_ceil_sky", idx)
        bfs = g("b_floor_sky", idx)
        # Sky bands exist at sky->nonsky portals AND on one-sided segs
        # (ref visitor.rs one-sided branch emits sky quads (ceiling, hmax)).
        sky_c = live & fcs & (~g("has_back", idx) | ~bcs)
        fc_act = g("f_ceil", idx) + off(g("f_ceil_obj", idx))
        rec(top1, jnp.minimum(bot1, row_of(fc_act, safe_t)), KIND_SKY,
            w=t, ok=sky_c)
        sky_f = live & ffs & (~g("has_back", idx) | ~bfs)
        ff_act = g("f_floor", idx) + off(g("f_floor_obj", idx))
        rec(jnp.maximum(top1, row_of(ff_act, safe_t)), bot1, KIND_SKY,
            w=t, ok=sky_f)
        # Wall pieces. u texel coordinate: s1 + (s2-s1)*u_frac + scroll*time.
        uf = u_k[:, k]
        for pi, piece in enumerate(("lower", "middle", "upper")):
            pe = pt["piece_exists"][idx, pi]
            transparent = pt["piece_transparent"][idx, pi]
            is_mid = piece == "middle"
            solid_mid = is_mid & ~g("has_back", idx)
            draw = live & pe & ~(transparent & ~solid_mid)
            plow = pt["piece_low"][idx, pi] + off(pt["piece_obj"][idx, pi])
            phigh = pt["piece_high"][idx, pi] + off(pt["piece_obj"][idx, pi])
            s1 = pt["piece_s1"][idx, pi]
            s2 = pt["piece_s2"][idx, pi]
            uu = s1 + (s2 - s1) * uf + pt["piece_scroll"][idx, pi] * time
            wl = lights_f[jnp.clip(pt["piece_light"][idx, pi], 0, lights_f.shape[0] - 1)]
            wa = anim_base(pt["piece_atlas"][idx, pi, :], walls_w)
            rec(jnp.maximum(top1, row_of(phigh, safe_t)),
                jnp.minimum(bot1, row_of(plow, safe_t)),
                KIND_WALL, p0=uu, a6=wa, light=wl, w=t,
                t1=pt["piece_t1"][idx, pi], t2=pt["piece_t2"][idx, pi],
                low=plow, high=phigh, ok=draw)

        # Window update.
        bc_eff = jnp.where(bcs, hmax, g("b_ceil", idx) + off(g("b_ceil_obj", idx)))
        bf_eff = jnp.where(bfs, hmin, g("b_floor", idx) + off(g("b_floor_obj", idx)))
        new_top = jnp.where(
            has_back, jnp.maximum(top1, row_of(bc_eff, safe_t)), top1
        )
        new_bot = jnp.where(
            has_back, jnp.minimum(bot1, row_of(bf_eff, safe_t)), bot1
        )
        closed = live & (~g("has_back", idx) | (new_top >= new_bot))
        top = jnp.where(live, new_top, top)
        bot = jnp.where(live, new_bot, bot)
        done = done | closed | ~jnp.isfinite(t)

    records = jnp.stack(recs)  # (R, NCH, W)

    # --- per-pixel classification (first matching record) -----------------
    rows = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5  # (H, 1)
    R = records.shape[0]
    best = jnp.full((H, W), R, jnp.int32)
    for r in range(R):
        hit = (rows >= records[r, R_Y0][None, :]) & (rows < records[r, R_Y1][None, :])
        best = jnp.where(hit & (best == R), r, best)
    covered = best < R
    sel = jnp.minimum(best, R - 1)
    arr = records.transpose(1, 0, 2)  # (NCH, R, W)
    ch = jnp.take_along_axis(
        arr, jnp.broadcast_to(sel[None, :, :], (NCH,) + sel.shape), axis=1
    )  # (NCH, H, W); per-column tables are tiny (R x W)
    ch = jnp.where(covered[None], ch, 0.0)

    # --- shading -----------------------------------------------------------
    kind = ch[R_KIND]
    ndc_y = (1.0 - (rows / H) * 2.0) * jnp.ones((H, W))  # = 1 - 2*(row+.5)/H
    # Flats: depth from plane height.
    plane_h = ch[R_P0]
    safe_ndc = jnp.where(jnp.abs(ndc_y) < 1e-9, 1e-9, ndc_y)
    t_flat = p11 * (plane_h - cyw) / safe_ndc
    hit_x = cx + d[None, :, 0] * t_flat
    hit_z = cz + d[None, :, 1] * t_flat
    flat_u = -hit_x * 100.0
    flat_v = -hit_z * 100.0
    # Walls: v from world height at the pixel row.
    h_at = cyw + ndc_y * ch[R_W] / p11
    denom_h = ch[R_HIGH] - ch[R_LOW]
    denom_h = jnp.where(denom_h == 0.0, 1.0, denom_h)
    wall_v = ch[R_T1] + (ch[R_T2] - ch[R_T1]) * (h_at - ch[R_LOW]) / denom_h
    uu = jnp.where(kind == KIND_WALL, ch[R_P0], flat_u)
    vv = jnp.where(kind == KIND_WALL, wall_v, flat_v)
    ts_x = jnp.where(ch[R_TSX] == 0.0, 1.0, ch[R_TSX])
    ts_y = jnp.where(ch[R_TSY] == 0.0, 1.0, ch[R_TSY])
    uu = jnp.mod(uu, ts_x) + ch[R_AX]
    vv = jnp.mod(vv, ts_y) + ch[R_AY]
    w_pix = jnp.where((kind == KIND_WALL) | ((kind == KIND_SKY) & (ch[R_W] > 0.0)), ch[R_W], t_flat)

    light = ch[R_LIGHT]
    dist_term = jnp.minimum(1.0, 1.0 - 0.9 / (w_pix + 0.9))
    lval = light * 2.0 - dist_term
    n_rows = scene.palette_lut.shape[0]
    crow = jnp.clip(jnp.floor((1.0 - lval) * n_rows).astype(jnp.int32), 0, n_rows - 1)

    # Sky texel coordinates (same formulas as the triangle path).
    grid = _pixel_grid(W, H)
    # v_r from pvm[:,2] = proj @ (third column of R^T) = proj @ (row 2 of
    # R_y(yaw)) = proj @ (-sin yaw, 0, cos yaw, 0)  (sky.vert).
    r0z, r1z, r2z = -sy_, 0.0, cy_
    far, near = pcfg.far, pcfg.near
    c22 = (far + near) / (near - far)
    fwd_x = p00 * r0z
    fwd_y = p11 * r1z
    fwd_z = c22 * r2z
    fwd_w = -r2z
    v_r0 = jnp.arctan2(fwd_x, fwd_z)
    v_r1 = fwd_y / jnp.where(fwd_w == 0.0, 1.0, fwd_w)
    ndc_x_full = grid[0].reshape(H, W) / (0.5 * W) - 1.0
    ndc_y_full = grid[1].reshape(H, W) / (0.5 * H) - 1.0
    sky_u = ndc_x_full - 4.0 * v_r0 / jnp.float32(math.pi)
    sky_v = -ndc_y_full + 1.0 + v_r1
    band = scene.tiled_band_size
    safe_band = jnp.where(band == 0.0, 1.0, band)
    below = jnp.abs(jnp.mod(-sky_v + safe_band, safe_band * 2.0) - safe_band)
    above = jnp.abs(jnp.mod(sky_v - 2.0 + safe_band, safe_band * 2.0) - safe_band)
    mid = 1.0 - sky_v
    sky_v = jnp.where(
        sky_v < 0.0,
        below,
        jnp.where(sky_v >= 2.0, above, jnp.where(sky_v >= 1.0, mid, sky_v)),
    )
    dims = scene.combo_dims
    sky_x = jnp.mod(jnp.floor(sky_u * dims[3, 1]).astype(jnp.int32), dims[3, 1])
    sky_y = jnp.mod(jnp.floor(sky_v * dims[3, 0]).astype(jnp.int32), dims[3, 0])

    is_sky = kind == KIND_SKY
    is_wall = kind == KIND_WALL
    plane = jnp.where(is_sky, 3, jnp.where(is_wall, 1, 0)).astype(jnp.int32)
    wrap_h = jnp.where(is_sky, dims[3, 0], jnp.where(is_wall, dims[1, 0], dims[0, 0]))
    wrap_w = jnp.where(is_sky, dims[3, 1], jnp.where(is_wall, dims[1, 1], dims[0, 1]))
    x_t = jnp.mod(jnp.floor(uu).astype(jnp.int32), jnp.maximum(wrap_w, 1))
    y_t = jnp.mod(jnp.floor(vv).astype(jnp.int32), jnp.maximum(wrap_h, 1))
    x_t = jnp.where(is_sky, sky_x, x_t)
    y_t = jnp.where(is_sky, sky_y, y_t)
    crow = jnp.where(is_sky, 0, crow)

    n_rows_c, _, hc, wc = scene.combo_atlas.shape
    lin = ((crow * 4 + plane) * hc + y_t) * wc + x_t
    value = jnp.take(scene.combo_atlas.reshape(-1), lin)
    index = (value & 255).astype(jnp.uint8)
    hole = value >= 256
    covered = covered & ~(hole & ~is_sky & (kind != KIND_NONE))
    index = jnp.where(covered, index, 0)

    # Depth for the masked/sprite merge: z_clip = c22*z_view + c23 with
    # z_view = -w, so z_ndc = -c22 + c23 / w.
    c23 = 2.0 * far * near / (near - far)
    z_ndc = jnp.where(covered, -c22 + c23 / jnp.maximum(w_pix, 1e-6), jnp.inf)
    return index, covered, z_ndc


def _masked_pass(scene, cfg, width, height, prep, masked_ids, index, covered,
                 z_portal):
    """Sprites + masked (transparent) walls: a dense triangle pass over the
    STATIC masked-triangle subset (a handful of rows), depth-merged over
    the portal output."""
    if masked_ids.shape[0] == 0:
        return index, covered
    grid = _pixel_grid(width, height)
    n_layers = max(int(cfg.depth_layers), 1)

    per_tri = (
        "e", "det", "vz", "vs", "tri_pass", "transparent", "v_tile_uv_tri",
        "v_atlas_a_tri", "v_atlas_b_tri", "v_tile_size_tri", "v_light_tri",
        "tri_ybounds",
    )
    sub = {k: (v[masked_ids] if k in per_tri else v) for k, v in prep.items()}
    z_l, id_l = _peel_layers_jnp(sub, grid, n_layers)
    from .raster_jnp import _alpha_survives, _shade

    zp = z_portal.reshape(-1)
    Tm = sub["e"].shape[0]
    best = jnp.full((grid.shape[1],), -1, jnp.int32)
    resolved = jnp.zeros((grid.shape[1],), bool)
    for k in range(n_layers):
        has = jnp.isfinite(z_l[k]) & (id_l[k] < Tm) & (z_l[k] < zp)
        tid = jnp.minimum(jnp.where(has, id_l[k], 0), Tm - 1)
        ok = _alpha_survives(scene, sub, tid, grid, has)
        win = ok & ~resolved
        best = jnp.where(win, tid, best)
        resolved = resolved | win | ~has
    m_idx, m_cov = _shade(scene, cfg, width, height, sub, best, grid)
    index = jnp.where(m_cov.reshape(index.shape), m_idx.reshape(index.shape), index)
    covered = covered | m_cov.reshape(covered.shape)
    return index, covered


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_frames_portal(pscene, scene, cfg: GameConfig, state, width, height):
    """(indices (B, H, W) u8, covered (B, H, W) bool) via the portal path."""
    n_cross = int(cfg.portal_crossings)

    masked_ids = pscene["masked_ids"]

    def one(pos, yaw, pitch, off, t):
        idx, cov, zp = _render_env_portal(
            pscene, scene, cfg, width, height, n_cross,
            pos, yaw, pitch, off, t,
        )
        prep = _prepare_env(scene, cfg, width, height, pos, yaw, pitch, off, t)
        idx, cov = _masked_pass(
            scene, cfg, width, height, prep, masked_ids, idx, cov, zp
        )
        return idx, cov

    return jax.vmap(one)(
        state.pos, state.yaw, state.pitch, state.object_offset, state.time
    )
