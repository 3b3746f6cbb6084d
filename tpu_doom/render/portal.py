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

Pitch (free look, ref game/src/player.rs:205-217): the column walk
assumes screen-vertical walls, which only holds at pitch == 0. Envs with
|pitch| > PITCH_EPS are therefore rendered by the triangle path -- a
batch-level `lax.cond` runs it only on ticks where some env actually
pitches, and a per-env select picks the triangle frames for exactly those
envs. Exact by construction (the triangle path IS the oracle), zero extra
device time while every env looks straight ahead.
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

# Envs whose |pitch| exceeds this render via the triangle path (see module
# docstring). The sim snaps pitch to exact 0.0 when look.y is idle only in
# the sense that it never perturbs a zero pitch, so an eps (not == 0.0)
# keeps float dust from forcing the fallback.
PITCH_EPS = 1e-5

# Record channel layout.
R_Y0, R_Y1, R_KIND, R_P0 = 0, 1, 2, 3
R_AX, R_AY, R_TSX, R_TSY, R_ROWH, R_FRAMES = 4, 5, 6, 7, 8, 9
R_LIGHT, R_W, R_T1, R_T2, R_LOW, R_HIGH = 10, 11, 12, 13, 14, 15
NCH = 16
KIND_NONE, KIND_FLAT, KIND_WALL, KIND_SKY = 0.0, 1.0, 2.0, 3.0
RECORDS_PER_CROSSING = 7


def portal_scene_from_table(table, arrays=None, pad_masked_to=None) -> dict:
    """PortalTable (numpy dataclass) -> dict pytree of jnp arrays. When the
    LevelArrays are provided, also precomputes the static index list of
    masked triangles (transparent walls + decor) in the combined triangle
    list, so the masked pass peels a handful of triangles instead of T.

    pad_masked_to: pad masked_ids with inert entries up to this length
    (LevelBank stacks portal scenes of several levels; masked_count masks
    the padding out in the masked pass)."""
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
        count = masked.size
        if pad_masked_to is not None:
            masked = np.pad(masked, (0, pad_masked_to - count))
        out["masked_ids"] = jnp.asarray(masked)
        out["masked_count"] = jnp.int32(count)
    return out


def _walk_env(pt, scene, cfg, width, height, n_cross,
              pos, yaw, pitch, object_offset, time):
    """Crossings + column walk -> (records (R, NCH, W), aux for shading)."""
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

    def anim_base(a6, atlas_w):
        """Animation frame select on a (..., 6) bounds block (flats use
        the flats-plane width; walls the walls plane)."""
        flat = a6.reshape(-1, 6)
        out = _anim_atlas_uv(
            flat[:, 0:2], flat[:, 2:4], flat[:, 4],
            flat[:, 5].astype(jnp.int32), atlas_w, time,
        )
        return out.reshape(a6.shape[:-1] + (2,)), a6[..., 2:4]

    flats_w = float(scene.flats_atlas.shape[1])
    walls_w = float(scene.walls_atlas_index.shape[1])

    # --- the walk (parallel over crossings) ---------------------------------
    # The walk is sequential only through the vertical clip window, and the
    # window is a running max/min over the crossings seen so far -- an
    # associative prefix. So instead of a loop (unrolled: superlinear XLA
    # compile blowup; lax.scan: per-iteration dispatch overhead on this
    # device), compute every crossing's quantities vectorized over (K, W)
    # and recover the clip window with cummax/cummin along K.
    #
    # Per-seg state (movable-object offsets, sky substitutions, resolved
    # light values, animation frame select) is computed at (S,) scale where
    # gathers are trivial, packed into one (S, C) matrix, and expanded to
    # the (K, W) crossings with a single one-hot matmul -- the MXU does the
    # gather (dozens of separate (K, W)-sized XLA gathers measured ~3 ms
    # EACH on this device; one f32 matmul at S<=a few thousand is ~1 ms).
    hmin, hmax = pt["hmin"], pt["hmax"]
    NEG, POS = jnp.float32(-1e9), jnp.float32(1e9)
    ls = lights_f.shape[0]

    objoff = object_offset
    fc_s = pt["f_ceil"] + objoff[pt["f_ceil_obj"]]
    ff_s = pt["f_floor"] + objoff[pt["f_floor_obj"]]
    fcs_s, ffs_s = pt["f_ceil_sky"], pt["f_floor_sky"]
    bcs_s, bfs_s = pt["b_ceil_sky"], pt["b_floor_sky"]
    ca_b, ca_t = anim_base(pt["ceil_atlas"], flats_w)  # (S, 2) each
    fa_b, fa_t = anim_base(pt["floor_atlas"], flats_w)
    plow_s = pt["piece_low"] + objoff[pt["piece_obj"]]  # (S, 3)
    phigh_s = pt["piece_high"] + objoff[pt["piece_obj"]]
    pa_s = pt["piece_s1"] + pt["piece_scroll"] * time
    pb_s = pt["piece_s2"] - pt["piece_s1"]
    pl_s = lights_f[jnp.clip(pt["piece_light"], 0, ls - 1)]
    wa_b, wa_t = anim_base(pt["piece_atlas"], walls_w)  # (S, 3, 2)

    cols = [
        pt["has_back"], fc_s, ff_s, fcs_s, ffs_s, bcs_s, bfs_s,
        jnp.where(fcs_s, hmax, fc_s),  # 7: ceil row/plane height
        jnp.where(ffs_s, hmin, ff_s),  # 8: floor row/plane height
        jnp.where(bcs_s, hmax, pt["b_ceil"] + objoff[pt["b_ceil_obj"]]),
        jnp.where(bfs_s, hmin, pt["b_floor"] + objoff[pt["b_floor_obj"]]),
        lights_f[jnp.clip(pt["flat_light"], 0, ls - 1)],  # 11
        ca_b[:, 0], ca_b[:, 1], ca_t[:, 0], ca_t[:, 1],  # 12-15
        fa_b[:, 0], fa_b[:, 1], fa_t[:, 0], fa_t[:, 1],  # 16-19
    ]
    PIECE0, PIECE_C = len(cols), 13
    for pi in range(3):
        cols += [
            pt["piece_exists"][:, pi], pt["piece_transparent"][:, pi],
            plow_s[:, pi], phigh_s[:, pi], pa_s[:, pi], pb_s[:, pi],
            pt["piece_t1"][:, pi], pt["piece_t2"][:, pi], pl_s[:, pi],
            wa_b[:, pi, 0], wa_b[:, pi, 1], wa_t[:, pi, 0], wa_t[:, pi, 1],
        ]
    table = jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)  # (S, C)

    idx = order.T  # (K, W)
    t = t_k.T
    uf = u_k.T
    S = table.shape[0]
    onehot = (idx[..., None] == jnp.arange(S)[None, None, :]).astype(jnp.float32)
    vals = jnp.einsum(
        "kws,sc->kwc", onehot, table, preferred_element_type=jnp.float32
    )  # (K, W, C); one-hot rows make this an exact f32 row-select
    col = lambda c: vals[..., c]

    valid = jnp.isfinite(t)
    safe_t = jnp.where(valid, t, 1.0)

    hb = col(0) > 0.5
    fc, ff = col(1), col(2)
    fcs, ffs = col(3) > 0.5, col(4) > 0.5
    bcs, bfs = col(5) > 0.5, col(6) > 0.5
    light_flat = col(11)

    r_fc = row_of(col(7), safe_t)
    r_ff = row_of(col(8), safe_t)
    row_bc = row_of(col(9), safe_t)
    row_bf = row_of(col(10), safe_t)

    # Clip-window prefix: crossing k contributes its ceiling row (and, for
    # portals, the back-ceiling row) to every later crossing's top, and
    # symmetrically for bot. Invalid crossings contribute identities.
    step_top = jnp.where(valid, jnp.where(hb, jnp.maximum(r_fc, row_bc), r_fc), NEG)
    step_bot = jnp.where(valid, jnp.where(hb, jnp.minimum(r_ff, row_bf), r_ff), POS)
    cum_top = jax.lax.cummax(step_top, axis=0)
    cum_bot = jax.lax.cummin(step_bot, axis=0)
    # Exclusive prefix (window BEFORE crossing k), seeded with [0, H).
    top = jnp.maximum(
        0.0, jnp.concatenate([jnp.full((1, W), NEG), cum_top[:-1]], axis=0)
    )
    bot = jnp.minimum(
        float(H), jnp.concatenate([jnp.full((1, W), POS), cum_bot[:-1]], axis=0)
    )
    top1 = jnp.maximum(top, r_fc)
    bot1 = jnp.minimum(bot, r_ff)

    # done/live prefix: a column stops at its first solid wall or shut
    # window (or when it runs out of crossings).
    new_top = jnp.where(hb, jnp.maximum(top1, row_bc), top1)
    new_bot = jnp.where(hb, jnp.minimum(bot1, row_bf), bot1)
    blocker = (valid & (~hb | (new_top >= new_bot))) | ~valid
    blocked = jax.lax.cummax(blocker.astype(jnp.int32), axis=0) > 0
    done_before = jnp.concatenate(
        [jnp.zeros((1, W), bool), blocked[:-1]], axis=0
    )
    live = valid & ~done_before

    recs = []  # 7 record families, each (K, NCH, W)

    def rec(y0, y1, kind, p0=0.0, ab=None, light=0.0, w=0.0,
            t1=0.0, t2=0.0, low=0.0, high=0.0, ok=None):
        ch = [None] * NCH
        zero = jnp.zeros((n_cross, W), jnp.float32)
        ok_ = ok if ok is not None else jnp.ones((n_cross, W), bool)
        ch[R_Y0] = jnp.where(ok_, y0, 1e9) + zero
        ch[R_Y1] = jnp.where(ok_, y1, -1e9) + zero
        ch[R_KIND] = jnp.where(ok_, kind, KIND_NONE) + zero
        ch[R_P0] = p0 + zero
        if ab is None:
            for c in range(R_AX, R_FRAMES + 1):
                ch[c] = zero
        else:
            ch[R_AX], ch[R_AY] = ab[0] + zero, ab[1] + zero
            ch[R_TSX], ch[R_TSY] = ab[2] + zero, ab[3] + zero
            ch[R_ROWH] = zero
            ch[R_FRAMES] = zero
        ch[R_LIGHT] = light + zero
        ch[R_W] = w + zero
        ch[R_T1] = t1 + zero
        ch[R_T2] = t2 + zero
        ch[R_LOW] = low + zero
        ch[R_HIGH] = high + zero
        recs.append(jnp.stack(ch, axis=1))  # (K, NCH, W)

    # Ceiling span [top, min(bot, r_fc)): front sector ceiling (or sky).
    # Sky ceilings are planes at hmax (the reference's sky polys), which
    # also gives the masked/sprite merge the true GL depth.
    rec(top, jnp.minimum(bot, r_fc),
        jnp.where(fcs, KIND_SKY, KIND_FLAT),
        p0=col(7), ab=(col(12), col(13), col(14), col(15)),
        light=light_flat, ok=live)
    # Floor span [max(top, r_ff), bot).
    rec(jnp.maximum(top, r_ff), bot,
        jnp.where(ffs, KIND_SKY, KIND_FLAT),
        p0=col(8), ab=(col(16), col(17), col(18), col(19)),
        light=light_flat, ok=live)

    # Sky bands at sky->nonsky boundaries (walker sky quads); also emitted
    # on one-sided segs (ref visitor.rs one-sided branch: (ceiling, hmax)).
    sky_c = live & fcs & (~hb | ~bcs)
    rec(top1, jnp.minimum(bot1, row_of(fc, safe_t)), KIND_SKY,
        w=t, ok=sky_c)
    sky_f = live & ffs & (~hb | ~bfs)
    rec(jnp.maximum(top1, row_of(ff, safe_t)), bot1, KIND_SKY,
        w=t, ok=sky_f)
    # Wall pieces. u texel coordinate: s1 + (s2-s1)*u_frac + scroll*time
    # (the time term is folded into the table's "a" column).
    for pi, piece in enumerate(("lower", "middle", "upper")):
        c0 = PIECE0 + pi * PIECE_C
        pe = col(c0) > 0.5
        transparent = col(c0 + 1) > 0.5
        solid_mid = (piece == "middle") & ~hb
        draw = live & pe & ~(transparent & ~solid_mid)
        plow, phigh = col(c0 + 2), col(c0 + 3)
        uu = col(c0 + 4) + col(c0 + 5) * uf
        rec(jnp.maximum(top1, row_of(phigh, safe_t)),
            jnp.minimum(bot1, row_of(plow, safe_t)),
            KIND_WALL, p0=uu,
            ab=(col(c0 + 9), col(c0 + 10), col(c0 + 11), col(c0 + 12)),
            light=col(c0 + 8), w=t,
            t1=col(c0 + 6), t2=col(c0 + 7),
            low=plow, high=phigh, ok=draw)

    # (K, 7, NCH, W) -> (R, NCH, W): record order is crossing-major
    # (front-to-back), family-minor -- identical to the sequential walk.
    rec_k = jnp.stack(recs, axis=1)
    records = rec_k.reshape(n_cross * RECORDS_PER_CROSSING, NCH, W)
    aux = dict(cam=jnp.stack([cx, cyw, cz]), d=d, sy=sy_, cy=cy_)
    return records, aux


def _classify_jnp(records, height):
    """First-match span classification (jnp reference for the Pallas
    kernel in tpu_doom.ops): (R, NCH, W) -> (NCH, H, W); kind channel is 0
    where nothing matched."""
    H = height
    W = records.shape[2]
    rows = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5  # (H, 1)

    def body(carry, r):  # r: (NCH, W)
        done, out = carry
        hit = ~done & (rows >= r[R_Y0][None, :]) & (rows < r[R_Y1][None, :])
        out = jnp.where(hit[None], r[:, None, :], out)
        return (done | hit, out), None

    carry0 = (
        jnp.zeros((H, W), bool),
        jnp.zeros((NCH, H, W), jnp.float32),
    )
    (_, ch), _ = jax.lax.scan(body, carry0, records)
    return ch


def _shade_portal(pt, scene, cfg, width, height, ch, aux, object_offset, time):
    """Fragment shading from classified channels (NCH, H, W)."""
    pcfg = cfg.player
    H, W = height, width
    f = 1.0 / jnp.tan(jnp.float32(math.radians(cfg.fov)) / 2.0)
    aspect = (W / H) * pcfg.aspect_ratio_correction
    p00 = f / aspect
    p11 = f
    cx, cyw, cz = aux["cam"][0], aux["cam"][1], aux["cam"][2]
    d = aux["d"]
    sy_, cy_ = aux["sy"], aux["cy"]
    rows = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    covered = ch[R_KIND] != KIND_NONE

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


def _mask_invalid_masked(sub, masked_count, batched):
    """Deactivate padded masked_ids rows (LevelBank pads the masked list
    across levels): det=0 culls them in every peel backend; empty y-bounds
    drop them from chunk culling."""
    m = sub["det"].shape[-1]
    valid = jnp.arange(m) < masked_count  # (M,)
    if batched:
        valid = jnp.broadcast_to(valid, sub["det"].shape)
    sub = dict(sub)
    sub["det"] = jnp.where(valid, sub["det"], 0.0)
    yb = sub["tri_ybounds"]
    empty = jnp.stack(
        [jnp.full_like(yb[..., 0], jnp.inf), jnp.full_like(yb[..., 1], -jnp.inf)],
        axis=-1,
    )
    sub["tri_ybounds"] = jnp.where(valid[..., None], yb, empty)
    return sub


def _masked_pass(scene, cfg, width, height, prep, masked_ids, index, covered,
                 z_portal, masked_count=None):
    """Sprites + masked (transparent) walls: a dense triangle pass over the
    STATIC masked-triangle subset (a handful of rows), depth-merged over
    the portal output."""
    if masked_ids.shape[0] == 0:
        return index, covered
    grid = _pixel_grid(width, height)
    n_layers = min(max(int(cfg.depth_layers), 1), 2)  # match _masked_pass_fused

    per_tri = (
        "e", "det", "vz", "vs", "tri_pass", "transparent", "v_tile_uv_tri",
        "v_atlas_a_tri", "v_atlas_b_tri", "v_tile_size_tri", "v_light_tri",
        "tri_ybounds",
    )
    sub = {k: (v[masked_ids] if k in per_tri else v) for k, v in prep.items()}
    if masked_count is not None:
        sub = _mask_invalid_masked(sub, masked_count, batched=False)
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


def _masked_pass_fused(scene, cfg, width, height, prep, masked_ids, index,
                       covered, z_portal, interpret, masked_count=None):
    """Kernel-path masked/sprite merge: the fused peel+resolve kernel over
    the STATIC masked-triangle subset, shaded by _shade_from_channels with
    a per-pixel z limit (the portal's opaque depth). prep is batched."""
    from ..ops.raster_pallas import (
        pack_triangle_attrs,
        pack_triangle_rows_full,
        peel_resolve_pallas,
    )
    from .raster_jnp import _shade_from_channels

    if masked_ids.shape[0] == 0:
        return index, covered
    grid = _pixel_grid(width, height)
    # Two transparency layers suffice for the merge: the nearest masked
    # fragment plus one hole-fallthrough (each extra layer costs a dense
    # combo-atlas take, ~30 ms at B=64 320x200 on this device; the
    # reference draws masked quads with a plain GL depth test, i.e. no
    # transparency stacking guarantees at all -- visitor.rs masked pass).
    n_layers = min(max(int(cfg.depth_layers), 1), 2)
    batch = index.shape[0]

    per_tri = (
        "e", "det", "vz", "vs", "tri_pass", "transparent", "v_tile_uv_tri",
        "v_atlas_a_tri", "v_atlas_b_tri", "v_tile_size_tri", "v_light_tri",
        "tri_ybounds",
    )
    sub = {k: (v[:, masked_ids] if k in per_tri else v) for k, v in prep.items()}
    if masked_count is not None:
        sub = _mask_invalid_masked(sub, masked_count, batched=True)
    rows = pack_triangle_rows_full(
        sub["e"], sub["det"], sub["vz"], sub["vs"], sub["v_tile_uv_tri"]
    )
    light_val = jnp.take_along_axis(
        sub["lights_f"],
        jnp.clip(sub["v_light_tri"], 0, sub["lights_f"].shape[-1] - 1),
        axis=-1,
    )
    attrs = pack_triangle_attrs(
        sub["v_tile_size_tri"], sub["v_atlas_a_tri"], sub["v_atlas_b_tri"],
        light_val, sub["tri_pass"], sub["transparent"], sub["det"],
    )
    ybounds = sub["tri_ybounds"]
    order = jnp.argsort(ybounds[..., 0], axis=-1)
    rows = jnp.take_along_axis(rows, order[..., None], axis=1)
    attrs = jnp.take_along_axis(attrs, order[..., None], axis=1)
    ybounds = jnp.take_along_axis(ybounds, order[..., None], axis=1)
    channels = peel_resolve_pallas(
        rows, attrs, grid, ybounds, n_layers,
        tile_p=cfg.raster_tile_p,
        chunk_t=min(cfg.raster_chunk_t, 64),
        interpret=interpret,
    )
    m_idx, m_cov = jax.vmap(
        lambda ch, lf, pvm, zp: _shade_from_channels(
            scene, cfg, width, height, ch, lf, pvm, grid, z_limit=zp
        )
    )(channels, sub["lights_f"], sub["pvm"], z_portal.reshape(batch, -1))
    m_idx = m_idx.reshape(index.shape)
    m_cov = m_cov.reshape(covered.shape)
    return jnp.where(m_cov, m_idx, index), covered | m_cov


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_frames_portal(pscene, scene, cfg: GameConfig, state, width, height):
    """(indices (B, H, W) u8, covered (B, H, W) bool) via the portal path.

    Envs with nonzero pitch fall back to the triangle path (module
    docstring); everything else renders through the column walk.

    Kernel selection: raster_backend "portal" uses the Pallas classify +
    masked-merge kernels on TPU (jnp fallbacks elsewhere); "portal_interpret"
    forces the kernels in interpret mode (CI coverage of the TPU code path
    on CPU); "portal_jnp" forces the pure-jnp fallbacks everywhere."""
    idx, cov = _render_portal_zero_pitch(
        pscene, scene, cfg, state, width, height
    )

    # Pitch fallback (exact): triangle-path frames for pitched envs only.
    import dataclasses as _dc

    from .raster_jnp import render_frames

    pitched = jnp.abs(state.pitch) > PITCH_EPS  # (B,)
    tri_backend = "jnp" if cfg.raster_backend == "portal_jnp" else "auto"
    tri_cfg = _dc.replace(cfg, raster_backend=tri_backend)

    def tri_path(_):
        return render_frames(scene, tri_cfg, state, width, height)

    def no_tri(_):
        return jnp.zeros_like(idx), jnp.zeros_like(cov)

    idx_t, cov_t = jax.lax.cond(jnp.any(pitched), tri_path, no_tri, None)
    sel = pitched[:, None, None]
    return jnp.where(sel, idx_t, idx), jnp.where(sel, cov_t, cov)


def _render_portal_zero_pitch(pscene, scene, cfg: GameConfig, state, width,
                              height):
    """The column-walk path proper (pitch treated as zero)."""
    n_cross = int(cfg.portal_crossings)

    masked_ids = pscene["masked_ids"]
    masked_count = pscene.get("masked_count")
    interpret = cfg.raster_backend == "portal_interpret"
    use_kernels = interpret or (
        jax.default_backend() in ("tpu", "axon")
        and cfg.raster_backend != "portal_jnp"
    )

    def walk(pos, yaw, pitch, off, t):
        return _walk_env(
            pscene, scene, cfg, width, height, n_cross,
            pos, yaw, pitch, off, t,
        )

    records, aux = jax.vmap(walk)(
        state.pos, state.yaw, state.pitch, state.object_offset, state.time
    )  # records: (B, R, NCH, W)

    if use_kernels:
        from ..ops.raster_pallas import classify_records_pallas

        ch = classify_records_pallas(records, height, interpret=interpret)
    else:
        ch = jax.vmap(lambda r: _classify_jnp(r, height))(records)

    def shade(ch_e, cam, d, sy, cy, off, t):
        aux_e = dict(cam=cam, d=d, sy=sy, cy=cy)
        return _shade_portal(
            pscene, scene, cfg, width, height, ch_e, aux_e, off, t
        )

    idx, cov, zp = jax.vmap(shade)(
        ch, aux["cam"], aux["d"], aux["sy"], aux["cy"],
        state.object_offset, state.time,
    )

    prep = jax.vmap(
        lambda pos, yaw, pitch, off, t: _prepare_env(
            scene, cfg, width, height, pos, yaw, pitch, off, t
        )
    )(state.pos, state.yaw, state.pitch, state.object_offset, state.time)

    if use_kernels:
        return _masked_pass_fused(
            scene, cfg, width, height, prep, masked_ids, idx, cov, zp,
            interpret, masked_count=masked_count,
        )

    def masked(prep_e, idx_e, cov_e, zp_e):
        return _masked_pass(
            scene, cfg, width, height, prep_e, masked_ids, idx_e, cov_e, zp_e,
            masked_count=masked_count,
        )

    return jax.vmap(masked)(prep, idx, cov, zp)
