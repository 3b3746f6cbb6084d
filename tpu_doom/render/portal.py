"""Portal (column) renderer: the 2.5D fast path.

At zero pitch, Doom walls are screen-vertical and flats are horizontal
planes, so visibility per screen column reduces to a front-to-back walk
over the column's ray/seg crossings (classic Doom's approach, reformulated
for lockstep SPMD):

  1. intersect each column's ray with every seg AND every sprite
     billboard (W x (S+D), vectorized; billboard endpoints are
     center +- camera_right * half_width, ref sprite.vert:40-41),
  2. sort crossings by depth, keep the nearest K,
  3. walk the K crossings per column carrying a vertical clip window,
     emitting WINDOW-CLIPPED span records (ceiling/floor flats with sky
     bands folded in, upper/lower/middle wall pieces, sprites, masked
     middles) -- at most 5 per crossing. Masked records (sprites + transparent middles) never
     shrink the window or block the walk; they carry bit-packed texture-
     column ALPHA WORDS fetched at (K, W) scale with one one-hot MXU
     matmul (the texture u is constant down a screen column, so a record
     needs at most ceil(atlas_height/32) u32 words),
  4. classify each pixel by its first matching record -- masked records
     match only where their texel alpha bit is set (GL discard,
     static.frag:21-22) -- and shade with the same combined colormapped
     atlas as the triangle path in ONE dense take.

Work per env is W*(S+D) crossing math + P*(7K) classification --
independent of triangle count, vs the rasterizer's P*T (a ~100x reduction
at real-WAD scale). Transparency resolves to ARBITRARY depth (every
masked record in the span list participates), unlike the triangle path's
K-layer peel.

Pitch (free look, ref game/src/player.rs:205-217): the column walk
assumes screen-vertical walls, which only holds under a rotation-free
camera. Pitched envs render with Y-SHEAR (the classic source-port
technique): geometry ndc-y shifts by -p11*tan(pitch) -- exactly the
screen-center displacement of the true pitch rotation -- so the walk's
zero-pitch machinery applies unchanged with a per-env row offset. The
camera position uses the reference's exact pitched offset
pos + R @ (0, camera_height, 0), and the SKY uses the exact pitched
view-direction formula (the sky's v_r1 is -p11*tan(pitch), constant
across the screen, so shear is EXACT for sky pixels). Walls/flats
differ from the true rotation away from the screen center (walls stay
screen-vertical; the classic Doom look) -- pinned mismatch ceilings in
test_portal quantify it. `portal_pitch="triangle"` restores the r2
behavior (pitched envs take the exact triangle path via a batch-level
`lax.cond`); shear is gated by |pitch| > PITCH_EPS either way, so
zero-pitch frames are bit-identical across modes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..sim.lights import light_table_u8
from ..utils.config import GameConfig
from .raster_jnp import (
    ANIM_FPS,
    _anim_atlas_uv,
    _pixel_grid,
)


def _anim_frame(num_frames, time):
    """Animation frame index (static.vert:30; same select as
    _anim_atlas_uv)."""
    nf = num_frames.astype(jnp.float32)
    return jnp.floor(jnp.mod(time / ANIM_FPS, jnp.maximum(nf, 1.0)))

INF = jnp.float32(jnp.inf)
# Finite depth sentinel for invalid crossings (see _walk_env: kept
# finite so one-hot compaction matmuls cannot produce 0 * inf = NaN).
BIG_T = jnp.float32(1e30)

# Envs whose |pitch| exceeds this engage the y-shear terms (or, with
# portal_pitch="triangle", the triangle-path fallback). Initial states
# carry pitch = 1e-8 (not 0.0) for numerical reasons; the eps keeps that
# from perturbing the zero-pitch bit pattern.
PITCH_EPS = 1e-5


def _shear_terms(pitch, pcfg, p11):
    """(shear_ndc, camera offset (3,)) for one env. shear_ndc =
    p11 * tan(pitch) is the exact screen-center displacement of the true
    pitch rotation; the camera offset is the reference's exact
    R_y(yaw)-free part folded later (the yaw part rides sy/cy). Gated by
    PITCH_EPS so pitch = 1e-8 initial states keep zero-pitch bits."""
    on = jnp.abs(pitch) > PITCH_EPS
    sp = jnp.where(on, jnp.sin(pitch), 0.0)
    cp = jnp.where(on, jnp.cos(pitch), 1.0)
    shear_ndc = p11 * sp / cp
    return on, sp, cp, shear_ndc

# Record channel layout. Channels [R_KIND, R_HIGH] -- the 11 the shade
# kernel consumes -- are CONTIGUOUS so the classify kernel's per-record
# output write is one slice (the output round trip is its dominant
# cost). R_CBASE: the record's frame-resolved base offset into the
# COMPACT texel table (the in-kernel shade path); the atlas-coordinate
# channels (R_AX, R_AY) serve only the XLA take path and sit at the end.
R_Y0, R_Y1, R_KIND, R_P0 = 0, 1, 2, 3
R_TSX, R_TSY, R_CBASE, R_LIGHT, R_W = 4, 5, 6, 7, 8
R_T1, R_T2, R_LOW, R_HIGH = 9, 10, 11, 12
R_MASKED, R_AX, R_AY = 13, 14, 15
KERNEL_CH0, KERNEL_NCH = R_KIND, 11  # classify kernel output slice
NCH = 16
KIND_NONE, KIND_FLAT, KIND_WALL, KIND_SKY, KIND_DECOR = 0.0, 1.0, 2.0, 3.0, 4.0
# Families per crossing: ceil flat/sky, floor flat/sky, lower, middle
# (the masked family: sprites + transparent middles), upper. The sky
# BANDS at sky->nonsky boundaries are folded into the two flat families
# (sky shading is record-independent, so extending the flat span's
# y-range with KIND_SKY is exact; see _walk_env).
RECORDS_PER_CROSSING = 5
MASKED_FAMILY = 3


def _resolve_visible_segs(cfg, sd: int) -> int:
    """Visible-seg compaction budget for a level with sd walk rows
    (segs + sprites). Explicit portal_visible_segs wins (0 = off); -1 =
    AUTO: off for small levels (the walk is already cheap and the
    compaction select + argsort overhead nets negative), else a budget
    sized from the seg count. Measured on :texstress: (590 rows, 64
    envs x 48 bench ticks): max visible rows 324, p50 191 -- the dense
    maze is pathological (the 101-degree wedge + front-facing test keeps
    ~55% of rows at peak because far-plane culling never triggers), so
    AUTO uses ceil(0.7*SD) rounded up to 64, clearing the measured max
    by 1.27x; sprawling real WADs (rooms beyond the wedge / far plane)
    cull far more at the same budget fraction. Never below n_cross (the
    sort take needs that many rows)."""
    sv = int(getattr(cfg, "portal_visible_segs", -1))
    if sv < 0:
        if sd <= 192:
            return 0
        sv = max(256, -(-(sd * 7) // 10 // 64) * 64)  # 0.7*SD up to x64
    return max(sv, int(cfg.portal_crossings)) if sv else 0


def _resolve_compact_crossings(cfg, sd: int) -> int:
    """Crossing-compaction budget. Explicit portal_compact_crossings
    wins (0 = off); -1 = AUTO: 8 on small levels, OFF on deep ones --
    see the config.py docstring (maze corridor views carry 16-23 live
    crossings, so a small budget overflows most poses onto the triangle
    fallback and the default config measures fallback speed)."""
    kc = int(getattr(cfg, "portal_compact_crossings", 0))
    if kc < 0:
        kc = 8 if sd <= 192 else 0
    return kc


def _pack_alpha_cols(combo_atlas, combo_dims):
    """Per-atlas-column bit-packed alpha for the walls (plane 1) and decor
    (plane 2) planes of the combined atlas: (2*wc, 4*n_words) f32 where
    column x holds the walls plane's column x and column wc+x the decor
    plane's, each as n_words u32 words split into BYTES (exact in bf16,
    so the walk's one-hot fetch rides the fast MXU path). Bit y of word
    y//32 = texel (y, x) is OPAQUE."""
    import numpy as np

    combo0 = np.asarray(combo_atlas[0])  # (4, hc, wc) any colormap row
    wc = combo0.shape[2]
    # Texture v coords stay inside the true walls/decor plane extents
    # (vv = mod(v, tsy) + ay < plane height, and the shading path wraps y
    # by the PLANE height), so pack only that many rows -- not the
    # common-padded combo height.
    dims = np.asarray(combo_dims)
    hc = max(int(dims[1, 0]), int(dims[2, 0]), 1)
    n_words = max(-(-hc // 32), 1)
    cols = np.zeros((2 * wc, n_words), dtype=np.uint32)
    for plane, base in ((1, 0), (2, wc)):
        # Slice to the packed height (the combo atlas itself may be
        # padded taller than the true plane, e.g. in LevelBank stacks).
        alpha = (combo0[plane, :hc] < 256).astype(np.uint32)  # (hc, wc)
        y = np.arange(hc)
        for w in range(n_words):
            rows = alpha[(y >> 5) == w]  # rows in this word
            bits = np.zeros((wc,), np.uint32)
            for j, yy in enumerate(y[(y >> 5) == w]):
                bits |= rows[j] << np.uint32(yy & 31)
            cols[base : base + wc, w] = bits
    by = np.zeros((2 * wc, 4 * n_words), dtype=np.float32)
    for bshift in range(4):
        by[:, bshift::4] = ((cols >> (8 * bshift)) & 0xFF).astype(np.float32)
    return by, n_words, hc, wc


def _frame_coords(ax, ay, tsx, row_h, atlas_w, frame):
    """Host copy of raster_jnp._anim_atlas_uv's frame placement for one
    integer frame: returns (ax_f, ay_f)."""
    au = ax + frame * tsx
    n_rows = math.ceil((au + tsx) / atlas_w) - 1 if atlas_w else 0
    safe_ts = tsx if tsx else 1.0
    au = au + ((atlas_w - ax) % safe_ts) * n_rows
    av = ay + n_rows * row_h
    return au, av


def _pack_compact_cells(t, arrays):
    """COMPACT per-cell texel table for the in-kernel shade path.

    Every texture cell any portal record can sample (flat tiles, wall
    piece cells, sprite cells -- each animation frame separately, frames
    contiguous, +1 guard row/col per frame) is copied out of the raw
    atlases into one dense 1-D table. Per-pixel shading then needs only
    cbase + ly*(tsx+1) + lx -- a table small enough for the Pallas
    one-hot-matmul lookup, independent of atlas padding.

    Returns (tex_i8, hole_bytes, cmap_i8, per-source cbase arrays); see
    the table comments below for the exact encodings (final value =
    cmap[crow*256 + texel], transparency as a separate packed bit).
    """
    import numpy as np

    flats = np.asarray(arrays.flats_atlas)
    walls_i = np.asarray(arrays.walls_atlas_index)
    walls_a = np.asarray(arrays.walls_atlas_alpha)
    decor_i = np.asarray(arrays.decor_atlas_index)
    decor_a = np.asarray(arrays.decor_atlas_alpha)

    def plane_raw(p):
        if p == 0:
            return flats.astype(np.int32)
        idx, alpha = (walls_i, walls_a) if p == 1 else (decor_i, decor_a)
        if idx.size == 0:
            return np.zeros((1, 1), np.int32)
        return np.where(alpha, idx.astype(np.int32), 256)

    raws = [plane_raw(p) for p in range(3)]
    flats_w = float(max(flats.shape[1], 1))
    walls_w = float(max(walls_i.shape[1], 1)) if walls_i.size else 1.0

    S = t.p1.shape[0]
    D = t.sprite_center.shape[0]

    def pack_layout(align: bool):
        """One table layout. align=True pads every cell base to an
        8-segment (1024-texel) boundary: the active-set gather kernel
        copies cell rows with dynamic-offset (8, 128) vector loads, and
        Mosaic requires the row offset to be a provable multiple of 8
        (hardware sublane tiling; unaligned dynamic loads fail to lower
        on real TPUs). align=False packs DENSE: the direct global
        lookup's cost is linear in table rows, and the r4 alignment
        grew the :test: table 534 -> 594 rows (-3.5%% on the whole
        driver point -- the alignment only matters for the gather)."""
        cells: dict[tuple, int] = {}
        cell_ids: dict[tuple, int] = {}
        cell_has_hole: dict[tuple, bool] = {}
        cell_blocks: list[tuple[int, int]] = []  # (base, len) per cell
        chunks: list = []
        size = 0
        nonmasked_holes = [False]
        hole_ranges: dict[tuple, tuple] = {}  # holey cells reachable
        # through a NON-masked reference: [start, end) texel ranges
        last_cid = [-1]  # cell id of the most recent cell_base call

        def cell_base(plane, a6, atlas_w, masked_ref=False):
            """cbase0 for one (ax, ay, tsx, tsy, row_h, nf) block;
            allocates nf contiguous frames of (tsx+1)*(tsy+1) on first
            sight."""
            nonlocal size
            ax, ay, tsx, tsy, row_h, nf = (float(v) for v in a6)
            nf = max(int(nf), 1)
            itsx, itsy = int(tsx), int(tsy)
            if itsx <= 0 or itsy <= 0:
                last_cid[0] = -1
                return 0.0
            key = (plane, ax, ay, tsx, tsy, row_h, nf)
            if key not in cells:
                alignpad = (-size) % 1024 if align else 0
                if alignpad:
                    chunks.append(np.zeros((alignpad,), np.int32))
                    size += alignpad
                cells[key] = size
                cell_ids[key] = len(cell_ids)
                cell_blocks.append((size, nf * (itsx + 1) * (itsy + 1)))
                raw = raws[plane]
                ph, pw = raw.shape
                has_hole = False
                for f in range(nf):
                    ax_f, ay_f = _frame_coords(
                        ax, ay, tsx, row_h, atlas_w, f
                    )
                    # +1 guard row/col: jnp.mod(v, ts) can return
                    # EXACTLY ts for infinitesimally negative v (f32
                    # rounding), and the atlas paths then read the
                    # neighboring texel -- the guard replicates that
                    # read (atlas-wrapped).
                    ys = (int(ay_f) + np.arange(itsy + 1)) % ph
                    xs = (int(ax_f) + np.arange(itsx + 1)) % pw
                    block = raw[np.ix_(ys, xs)]
                    has_hole = has_hole or bool((block >= 256).any())
                    chunks.append(block.reshape(-1))
                size += nf * (itsx + 1) * (itsy + 1)
                cell_has_hole[key] = has_hole
            # A transparent texel reachable through a NON-masked
            # reference is a real hole (GL discard on a solid surface);
            # masked references are alpha-gated at classify time and
            # never sample holes.
            if not masked_ref and cell_has_hole[key]:
                nonmasked_holes[0] = True
                cid = cell_ids[key]
                base, blen = cell_blocks[cid]
                hole_ranges[key] = (base, base + blen)
            last_cid[0] = cell_ids[key]
            return float(cells[key])

        def cb_cid(plane, a6, atlas_w, masked_ref=False):
            return cell_base(plane, a6, atlas_w, masked_ref), last_cid[0]

        fl = [cb_cid(0, np.asarray(t.floor_atlas)[s], flats_w)
              for s in range(S)]
        ce = [cb_cid(0, np.asarray(t.ceil_atlas)[s], flats_w)
              for s in range(S)]
        ptrans = np.asarray(t.piece_transparent)
        pc = [
            [cb_cid(1, np.asarray(t.piece_atlas)[s, pi], walls_w,
                    masked_ref=bool(ptrans[s, pi]))
             for pi in range(3)]
            for s in range(S)
        ]
        sp = [cb_cid(2, np.asarray(t.sprite_atlas)[d], walls_w,
                     masked_ref=True) for d in range(D)]
        flat_tab = (
            np.concatenate(chunks) if chunks else np.zeros((1,), np.int32)
        ).astype(np.int32)
        flat_tab = np.pad(flat_tab, (0, (-flat_tab.size) % 128))
        return dict(
            flat_tab=flat_tab,
            floor_cb=np.array([v for v, _ in fl], np.float32),
            ceil_cb=np.array([v for v, _ in ce], np.float32),
            piece_cb=np.array(
                [[v for v, _ in row] for row in pc], np.float32
            ).reshape(S, 3),
            sprite_cb=np.array([v for v, _ in sp], np.float32),
            floor_cid=np.array([c for _, c in fl], np.int32),
            ceil_cid=np.array([c for _, c in ce], np.int32),
            piece_cid=np.array(
                [[c for _, c in row] for row in pc], np.int32
            ).reshape(S, 3),
            sprite_cid=np.array([c for _, c in sp], np.int32),
            cell_blocks=cell_blocks,
            nonmasked_holes=nonmasked_holes[0],
            hole_ranges=sorted(hole_ranges.values()),
        )

    dense = pack_layout(align=False)  # tex_i8/hole_bytes (global path)
    al = pack_layout(align=True)  # tex_full + cells (active-set path)
    # Cell ids are insertion-ordered and alignment only moves bases, so
    # the two layouts agree on every id assignment.
    assert np.array_equal(dense["floor_cid"], al["floor_cid"])
    flat_tab = dense["flat_tab"]
    floor_cb, ceil_cb = dense["floor_cb"], dense["ceil_cb"]
    piece_cb, sprite_cb = dense["piece_cb"], dense["sprite_cb"]
    floor_cid, ceil_cid = dense["floor_cid"], dense["ceil_cid"]
    piece_cid, sprite_cid = dense["piece_cid"], dense["sprite_cid"]
    cell_blocks = al["cell_blocks"]
    nonmasked_holes = [dense["nonmasked_holes"]]

    # Shade-kernel tables, all exact:
    # * tex_i8 (S1, 128): texel byte - 128 (s8; int8 MXU matmuls run at
    #   2x the bf16 rate and the arithmetic is pure-integer exact);
    # * hole_bytes (S_h, 128) s8: transparency bits packed 8 per entry,
    #   stored byte-128 (same exact int8 MXU lookup as tex_i8) -- the
    #   hole flag cannot ride the s8 texel alphabet (257 states), so it
    #   gets its own tiny lookup over a table 8x smaller;
    # * cmap_i8 (64, 128): the 32x256 colormap - 128 (s8).
    tex_i8 = ((flat_tab & 255) - 128).astype(np.int8).reshape(-1, 128)
    hole_bits = (flat_tab >= 256).astype(np.uint8)
    hbits = np.pad(hole_bits, (0, (-hole_bits.size) % 8)).reshape(-1, 8)
    hb = (hbits * (1 << np.arange(8))).sum(axis=1)
    hb = np.pad(hb, (0, (-hb.size) % 128))  # pad byte 0 = no holes
    hole_bytes = (hb - 128).astype(np.int8).reshape(-1, 128)

    cmaps = np.asarray(arrays.colormaps)[:32].astype(np.int32)  # (32, 256)
    cmap_i8 = (cmaps - 128).astype(np.int8).reshape(-1, 128)  # (64, 128)

    # Cell tables for the ACTIVE-SET path (levels whose compact table
    # exceeds the per-pixel lookup budget, render/portal docstring):
    # per distinct cell, the global segment range its nf-frame block
    # covers; per source, the cell id (-1 for degenerate).
    C = max(len(cell_blocks), 1)
    cell_gseg0 = np.zeros((C,), np.int32)
    cell_nsegs = np.zeros((C,), np.int32)
    for cid, (base, blen) in enumerate(cell_blocks):
        cell_gseg0[cid] = base >> 7
        cell_nsegs[cid] = ((base + blen - 1) >> 7) - (base >> 7) + 1

    bases = dict(
        floor_cbase=floor_cb, ceil_cbase=ceil_cb,
        piece_cbase=piece_cb, sprite_cbase=sprite_cb,
        floor_cbase_al=al["floor_cb"], ceil_cbase_al=al["ceil_cb"],
        piece_cbase_al=al["piece_cb"], sprite_cbase_al=al["sprite_cb"],
        floor_cid=floor_cid, ceil_cid=ceil_cid,
        piece_cid=piece_cid, sprite_cid=sprite_cid,
        cell_gseg0=cell_gseg0, cell_nsegs=cell_nsegs,
        holeless=not nonmasked_holes[0],
        hole_ranges=dense["hole_ranges"],
    )
    # tex_full: the full-alphabet table (texel 0..255, 256 = hole) for
    # the active path (bf16-exact values; holes ride the value itself,
    # so no separate hole table is needed there) -- built from the
    # ALIGNED layout, whose cbase offsets live in the *_cbase_al arrays.
    tex_full = al["flat_tab"].astype(np.float32).reshape(-1, 128)
    return tex_i8, hole_bytes, cmap_i8, tex_full, bases


def portal_scene_from_table(table, arrays=None) -> dict:
    """PortalTable (numpy dataclass) -> runtime dict pytree.

    Builds the UNIFIED crossing tables: S seg rows followed by D sprite
    rows (sprites fill only the middle wall-piece slot, flagged masked and
    non-solid), plus the bit-packed per-column alpha table for in-walk
    masked alpha fetches. `arrays` (LevelArrays) supplies the combined
    atlas the alpha bits pack from."""
    import numpy as np

    t = table
    S = t.p1.shape[0]
    D = t.sprite_center.shape[0]
    f32 = lambda x: np.asarray(x, np.float32)

    def cat(seg, spr):
        return np.concatenate([np.asarray(seg), np.asarray(spr)], axis=0)

    zs = np.zeros((D,), np.float32)
    zb = np.zeros((D,), bool)
    zi = np.zeros((D,), np.int32)
    z6 = np.zeros((D, 6), np.float32)

    out = {
        # Static seg geometry (sprite endpoints are computed per env).
        "p1": jnp.asarray(t.p1),
        "p2": jnp.asarray(t.p2),
        "sprite_center": jnp.asarray(t.sprite_center.reshape(D, 2)),
        "sprite_half": jnp.asarray(t.sprite_half),
        "hmin": jnp.asarray(t.hmin),
        "hmax": jnp.asarray(t.hmax),
        # Unified (S+D) rows.
        "has_back": jnp.asarray(cat(t.has_back, np.ones((D,), bool))),
        "is_solid": jnp.asarray(
            np.concatenate([np.ones((S,), bool), np.zeros((D,), bool)])
        ),
        "is_sprite": jnp.asarray(
            np.concatenate([np.zeros((S,), bool), np.ones((D,), bool)])
        ),
        "f_floor": jnp.asarray(cat(t.f_floor, zs)),
        "f_ceil": jnp.asarray(cat(t.f_ceil, zs)),
        "b_floor": jnp.asarray(cat(t.b_floor, zs)),
        "b_ceil": jnp.asarray(cat(t.b_ceil, zs)),
        "f_floor_obj": jnp.asarray(cat(t.f_floor_obj, zi)),
        "f_ceil_obj": jnp.asarray(cat(t.f_ceil_obj, zi)),
        "b_floor_obj": jnp.asarray(cat(t.b_floor_obj, zi)),
        "b_ceil_obj": jnp.asarray(cat(t.b_ceil_obj, zi)),
        "f_floor_sky": jnp.asarray(cat(t.f_floor_sky, zb)),
        "f_ceil_sky": jnp.asarray(cat(t.f_ceil_sky, zb)),
        "b_floor_sky": jnp.asarray(cat(t.b_floor_sky, zb)),
        "b_ceil_sky": jnp.asarray(cat(t.b_ceil_sky, zb)),
        "flat_light": jnp.asarray(cat(t.flat_light, zi)),
        "floor_atlas": jnp.asarray(cat(t.floor_atlas, z6)),
        "ceil_atlas": jnp.asarray(cat(t.ceil_atlas, z6)),
    }

    # Piece tables (S+D, 3): sprites occupy the middle slot.
    def piece_cat(seg_arr, mid_val, fill=0.0):
        spr = np.full((D, 3), fill, np.asarray(seg_arr).dtype)
        spr[:, 1] = mid_val
        return jnp.asarray(np.concatenate([np.asarray(seg_arr), spr], axis=0))

    out["piece_exists"] = piece_cat(t.piece_exists, True, False)
    out["piece_low"] = piece_cat(t.piece_low, t.sprite_low)
    out["piece_high"] = piece_cat(t.piece_high, t.sprite_high)
    out["piece_obj"] = piece_cat(t.piece_obj, t.sprite_obj)
    out["piece_s1"] = piece_cat(t.piece_s1, 0.0)
    out["piece_s2"] = piece_cat(t.piece_s2, t.sprite_s2)
    out["piece_t1"] = piece_cat(t.piece_t1, t.sprite_t1)
    out["piece_t2"] = piece_cat(t.piece_t2, t.sprite_t2)
    out["piece_light"] = piece_cat(t.piece_light, t.sprite_light)
    out["piece_scroll"] = piece_cat(t.piece_scroll, 0.0)
    # Masked = drawn-with-alpha: transparent middles (the table builder
    # only flags two-sided middles) + all sprites.
    out["piece_masked"] = piece_cat(t.piece_transparent, True, False)
    spr_atlas = np.zeros((D, 3, 6), np.float32)
    spr_atlas[:, 1, :] = f32(t.sprite_atlas)
    out["piece_atlas"] = jnp.asarray(
        np.concatenate([np.asarray(t.piece_atlas), spr_atlas], axis=0)
    )

    if arrays is not None:
        halves, n_words, hc, wc = _pack_alpha_cols(
            arrays.combo_atlas, arrays.combo_dims
        )
        out["alpha_cols"] = jnp.asarray(halves)
        out["alpha_meta"] = jnp.asarray([hc, wc], jnp.int32)

        # Compact texel/cmap tables + per-record frame-0 base offsets for
        # the in-kernel shade path (sprites fill the middle piece slot).
        tex_i8, hole_bytes, cmap_i8, tex_full, bases = _pack_compact_cells(
            t, arrays
        )
        # Holeless levels (no non-masked cell contains a transparent
        # texel -- flats are opaque by format, solid wall textures
        # almost always are too) OMIT the hole table: dict-key presence
        # is pytree STRUCTURE, i.e. a static property under jit, so the
        # fused kernel can skip the transparency lookup entirely.
        out["tex_i8"] = jnp.asarray(tex_i8)
        out["cmap_i8"] = jnp.asarray(cmap_i8)
        if not bases["holeless"]:
            out["hole_bytes"] = jnp.asarray(hole_bytes)
            # [start, end) DENSE-table texel ranges of holey cells
            # reachable through non-masked references: drives the
            # per-tile transparency-lookup gate (most tiles contain no
            # holey surface; skipping the hole lookup there measured
            # +12% on the whole driver point).
            out["hole_ranges"] = jnp.asarray(
                np.asarray(bases["hole_ranges"], np.float32).reshape(
                    -1, 2
                )
            )
        out["floor_cbase"] = jnp.asarray(cat(bases["floor_cbase"], zs))
        out["ceil_cbase"] = jnp.asarray(cat(bases["ceil_cbase"], zs))
        spr_pc = np.zeros((D, 3), np.float32)
        spr_pc[:, 1] = bases["sprite_cbase"]
        out["piece_cbase"] = jnp.asarray(
            np.concatenate([bases["piece_cbase"], spr_pc], axis=0)
        )
        # Aligned-layout cbases (tex_full coordinates) for the
        # active-set path; the dense ones above index tex_i8.
        out["floor_cbase_al"] = jnp.asarray(
            cat(bases["floor_cbase_al"], zs))
        out["ceil_cbase_al"] = jnp.asarray(cat(bases["ceil_cbase_al"], zs))
        spr_pc_al = np.zeros((D, 3), np.float32)
        spr_pc_al[:, 1] = bases["sprite_cbase_al"]
        out["piece_cbase_al"] = jnp.asarray(
            np.concatenate([bases["piece_cbase_al"], spr_pc_al], axis=0)
        )
        # Active-set (two-level lookup) tables: cell segment ranges, the
        # per-source cell ids as (S+D,)-row f32 table columns, and the
        # static seg->cells union matrix for per-env cell visibility.
        neg = np.full((D,), -1.0, np.float32)
        floor_cid = cat(bases["floor_cid"].astype(np.float32), neg)
        ceil_cid = cat(bases["ceil_cid"].astype(np.float32), neg)
        spr_cid3 = np.full((D, 3), -1.0, np.float32)
        spr_cid3[:, 1] = bases["sprite_cid"]
        piece_cid = np.concatenate(
            [bases["piece_cid"].astype(np.float32), spr_cid3], axis=0
        )
        out["floor_cid"] = jnp.asarray(floor_cid)
        out["ceil_cid"] = jnp.asarray(ceil_cid)
        out["piece_cid"] = jnp.asarray(piece_cid)
        out["cell_gseg0"] = jnp.asarray(
            bases["cell_gseg0"].astype(np.float32)
        )
        out["cell_nsegs"] = jnp.asarray(
            bases["cell_nsegs"].astype(np.float32)
        )
        C = bases["cell_gseg0"].shape[0]
        SD = S + D
        m = np.zeros((SD, C), np.float32)
        rows = np.arange(SD)
        for cid_arr in (floor_cid, ceil_cid, piece_cid[:, 0],
                        piece_cid[:, 1], piece_cid[:, 2]):
            ok = cid_arr >= 0
            m[rows[ok], cid_arr[ok].astype(np.int64)] = 1.0
        out["cell_m"] = jnp.asarray(m)
        # +8 guard rows: the gather kernel copies cells in 8-row blocks
        # (the tail block may over-read; later cells overwrite over-
        # written slots, the guard keeps the last block in bounds).
        out["tex_full"] = jnp.asarray(
            np.pad(tex_full, ((0, 8), (0, 0))), jnp.bfloat16
        )
        # Colormapped sky texture (combo plane 3 row 0 content): the sky's
        # texel coordinates are row/column separable per env, so the shade
        # kernel path builds per-env sky images with two cheap row-gather
        # takes instead of per-pixel table lookups.
        sky = np.asarray(arrays.sky_index)
        cmaps0 = np.asarray(arrays.colormaps)[0].astype(np.int32)
        out["sky_tex"] = jnp.asarray(cmaps0[sky.astype(np.int32)], jnp.int32)
    return out


def _walk_env(pt, scene, cfg, width, height, n_cross,
              pos, yaw, pitch, object_offset, time, active_segs: int = 0,
              select_kernel: str = ""):
    """Crossings + column walk -> (records (R, NCH, W), alpha words
    (K, n_words, W) i32, aux): record construction in XLA, consumed by
    the fused classify+shade kernel (or the jnp classify path).

    active_segs > 0 enables the ACTIVE-SET texture path for levels whose
    compact texel table exceeds the per-pixel MXU lookup budget: the
    cells visible in this frame are allocated contiguous slots of a
    per-env active table (aux["gather_meta"] drives the gather kernel),
    and every record's cbase channel is remapped to active-local
    coordinates. Frames needing more than active_segs segments set the
    overflow flag (exact triangle-path fallback, like compaction
    overflow)."""
    pcfg = cfg.player
    H, W = height, width
    f = 1.0 / jnp.tan(jnp.float32(math.radians(cfg.fov)) / 2.0)
    aspect = (W / H) * pcfg.aspect_ratio_correction
    p00 = f / aspect
    p11 = f

    # Camera. Pitch renders as y-shear (module docstring): the camera
    # offset is the reference's exact R @ (0, camera_height, 0) =
    # (sy*sp, cp, cy*sp) * camera_height, and geometry rows shift by
    # row_shear below. Zero-pitch envs keep sp = 0 / cp = 1 exactly.
    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
    _, sp_, cp_, shear_ndc = _shear_terms(pitch, pcfg, p11)
    cam = pos + pcfg.camera_height * jnp.stack(
        [sy_ * sp_, cp_, cy_ * sp_]
    )
    row_shear = 0.5 * H * shear_ndc
    cx, cyw, cz = cam[0], cam[1], cam[2]
    # look = R_y(yaw) @ (0,0,-1); right = R_y(yaw) @ (1,0,0)   (camera.py)
    fwd = jnp.stack([-sy_, -cy_])  # XZ
    right = jnp.stack([cy_, -sy_])

    i = jnp.arange(W, dtype=jnp.float32) + 0.5
    ndc_x = 2.0 * i / W - 1.0
    xv = ndc_x / p00
    d = fwd[None, :] + right[None, :] * xv[:, None]  # (W, 2); depth == t

    lights_f = light_table_u8(scene, time).astype(jnp.float32) / 255.0

    def row_of(h, tt):
        """Continuous image-row of world height h at depth tt (with the
        per-env pitch shear; row_shear == 0 at zero pitch)."""
        ndc_y = p11 * (h - cyw) / tt
        return H - (ndc_y + 1.0) * 0.5 * H + row_shear

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
    # light values, animation frame select) is computed at (S+D,) scale
    # where gathers are trivial, packed into one (S+D, C) matrix, and
    # expanded to the (K, W) crossings with a single one-hot matmul -- the
    # MXU does the gather (dozens of separate (K, W)-sized XLA gathers
    # measured ~3 ms EACH on this device; one f32 matmul is ~1 ms).
    hmin, hmax = pt["hmin"], pt["hmax"]
    NEG, POS = jnp.float32(-1e9), jnp.float32(1e9)
    ls = lights_f.shape[0]

    objoff = object_offset
    fc_s = pt["f_ceil"] + objoff[pt["f_ceil_obj"]]
    ff_s = pt["f_floor"] + objoff[pt["f_floor_obj"]]
    fcs_s, ffs_s = pt["f_ceil_sky"], pt["f_floor_sky"]
    bcs_s, bfs_s = pt["b_ceil_sky"], pt["b_floor_sky"]
    ca_b, ca_t = anim_base(pt["ceil_atlas"], flats_w)  # (S+D, 2) each
    fa_b, fa_t = anim_base(pt["floor_atlas"], flats_w)
    plow_s = pt["piece_low"] + objoff[pt["piece_obj"]]  # (S+D, 3)
    phigh_s = pt["piece_high"] + objoff[pt["piece_obj"]]
    pa_s = pt["piece_s1"] + pt["piece_scroll"] * time
    pb_s = pt["piece_s2"] - pt["piece_s1"]
    pl_s = lights_f[jnp.clip(pt["piece_light"], 0, ls - 1)]
    wa_b, wa_t = anim_base(pt["piece_atlas"], walls_w)  # (S+D, 3, 2)

    # Frame-resolved compact-table bases (frames are contiguous blocks of
    # (tsx+1)*(tsy+1) texels -- +1 for mod-boundary guards; see
    # _pack_compact_cells).
    def cbase_t(cb0, a6):
        fr = _anim_frame(a6[..., 5], time)
        return cb0 + fr * (a6[..., 2] + 1.0) * (a6[..., 3] + 1.0)

    # cbase source: the active-set path samples the ALIGNED tex_full
    # layout (the gather's block math needs 8-seg-aligned cell bases);
    # the global path samples the DENSE tex_i8 layout (smaller table =
    # linearly cheaper per-pixel lookup).
    sfx = "_al" if active_segs else ""
    ceil_cb_t = cbase_t(pt["ceil_cbase" + sfx], pt["ceil_atlas"])
    floor_cb_t = cbase_t(pt["floor_cbase" + sfx], pt["floor_atlas"])
    piece_cb_t = cbase_t(
        pt["piece_cbase" + sfx], pt["piece_atlas"]
    )  # (S+D, 3)

    cols = [
        pt["has_back"], fc_s, ff_s, fcs_s, ffs_s, bcs_s, bfs_s,
        jnp.where(fcs_s, hmax, fc_s),  # 7: ceil row/plane height
        jnp.where(ffs_s, hmin, ff_s),  # 8: floor row/plane height
        jnp.where(bcs_s, hmax, pt["b_ceil"] + objoff[pt["b_ceil_obj"]]),
        jnp.where(bfs_s, hmin, pt["b_floor"] + objoff[pt["b_floor_obj"]]),
        lights_f[jnp.clip(pt["flat_light"], 0, ls - 1)],  # 11
        ca_b[:, 0], ca_b[:, 1], ca_t[:, 0], ca_t[:, 1],  # 12-15
        fa_b[:, 0], fa_b[:, 1], fa_t[:, 0], fa_t[:, 1],  # 16-19
        pt["is_solid"], pt["is_sprite"],  # 20-21
        ceil_cb_t, floor_cb_t,  # 22-23
        pt.get("ceil_cid", ceil_cb_t * 0.0),  # 24 (active-set cell ids)
        pt.get("floor_cid", floor_cb_t * 0.0),  # 25
    ]
    PIECE0, PIECE_C = len(cols), 16
    pcid = pt.get("piece_cid", piece_cb_t * 0.0)
    for pi in range(3):
        cols += [
            pt["piece_exists"][:, pi], pt["piece_masked"][:, pi],
            plow_s[:, pi], phigh_s[:, pi], pa_s[:, pi], pb_s[:, pi],
            pt["piece_t1"][:, pi], pt["piece_t2"][:, pi], pl_s[:, pi],
            wa_b[:, pi, 0], wa_b[:, pi, 1], wa_t[:, pi, 0], wa_t[:, pi, 1],
            pt["piece_exists"][:, pi] & pt["piece_masked"][:, pi],  # 13
            piece_cb_t[:, pi],  # 14
            pcid[:, pi],  # 15 (active-set cell id)
        ]
    table = jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)

    # --- sprite billboard endpoints ------------------------------------
    # center -+ right * half (the -hw end maps to texel u 0, matching
    # raster_jnp's d_pos + right*local_x ordering).
    spc, sph = pt["sprite_center"], pt["sprite_half"]
    p1 = jnp.concatenate([pt["p1"], spc - right[None, :] * sph[:, None]])
    p2 = jnp.concatenate([pt["p2"], spc + right[None, :] * sph[:, None]])
    o = jnp.stack([cx, cz])

    # --- visible-seg compaction ------------------------------------------
    # Everything below -- the (W, S) crossing intersection, the per-column
    # sort, and every one-hot (K, W, S) attribute matmul -- scales with the
    # seg count, but only segs that can produce a VALID crossing matter.
    # A conservative per-seg test (camera strictly on the front side;
    # segment not wholly behind the near plane, beyond far, or outside
    # either frustum-wedge edge) is exact: a culled seg cannot yield a
    # valid crossing (t equals forward depth, which is linear along the
    # segment; rays stay inside the wedge; facing needs cross(po, e) > 0).
    # Survivors compact to portal_visible_segs rows with one stable
    # one-hot MXU select, so the walk's cost follows the VISIBLE count,
    # not the level size. Over-budget frames fall back to the exact
    # triangle path (aux overflow), like crossing-compaction overflow.
    SD_full = table.shape[0]
    SV = _resolve_visible_segs(cfg, SD_full)
    vis_oh = None
    if 0 < SV < SD_full:
        e_f = p2 - p1
        po_f = p1 - o[None, :]
        # Forward depth of each endpoint: t of a crossing at point q is
        # dot(q - o, fwd) exactly (d = fwd + right*xv, fwd orthonormal
        # to right), so a seg entirely outside (near, far) in forward
        # depth cannot host a valid crossing.
        q1 = (p1[:, 0] - o[0]) * fwd[0] + (p1[:, 1] - o[1]) * fwd[1]
        q2 = (p2[:, 0] - o[0]) * fwd[0] + (p2[:, 1] - o[1]) * fwd[1]
        # Facing: valid needs denom > 0 AND t > 0, i.e. cross(po, e) > 0
        # -- the camera strictly on the seg's front side. (For sprites
        # this reduces to the billboard center being in front.)
        front = po_f[:, 0] * e_f[:, 1] - po_f[:, 1] * e_f[:, 0] > 0.0
        # Frustum wedge: edge directions at xv = -+1/p00 bound every
        # pixel-center ray (|ndc_x| <= 1 - 1/W). Both endpoints strictly
        # outside the same edge's half-plane => the straight segment
        # never enters the wedge, and every crossing point o + t*d
        # (t > 0, d in-wedge) is inside it.
        xvmax = 1.0 / p00
        dl = fwd + right * (-xvmax)
        dr = fwd + right * xvmax
        cl1 = dl[0] * (p1[:, 1] - o[1]) - dl[1] * (p1[:, 0] - o[0])
        cl2 = dl[0] * (p2[:, 1] - o[1]) - dl[1] * (p2[:, 0] - o[0])
        cr1 = dr[0] * (p1[:, 1] - o[1]) - dr[1] * (p1[:, 0] - o[0])
        cr2 = dr[0] * (p2[:, 1] - o[1]) - dr[1] * (p2[:, 0] - o[0])
        vis = (
            front
            & (jnp.maximum(q1, q2) > pcfg.near)
            & (jnp.minimum(q1, q2) < pcfg.far)
            & ~((cl1 < 0.0) & (cl2 < 0.0))
            & ~((cr1 > 0.0) & (cr2 > 0.0))
        )
        overflow_vis = jnp.sum(vis) > SV
        ordv = jnp.argsort(
            (~vis).astype(jnp.int32), stable=True
        )[:SV]  # visible segs first, original order kept among them
        vis_oh = (
            ordv[:, None] == jnp.arange(SD_full)[None, :]
        ).astype(jnp.float32)  # (SV, SD_full)
        packed_sv = jnp.concatenate([p1, p2, table], axis=1)
        selv = jnp.einsum(
            "vs,sc->vc", vis_oh, packed_sv,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # exact f32 row select
        p1, p2, table = selv[:, :2], selv[:, 2:4], selv[:, 4:]
    else:
        overflow_vis = jnp.zeros((), bool)

    # --- crossings (W x Sv) ------------------------------------------------
    e = p2 - p1
    po = p1 - o[None, :]  # (Sv, 2)
    denom = d[:, None, 0] * e[None, :, 1] - d[:, None, 1] * e[None, :, 0]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    t = (po[None, :, 0] * e[None, :, 1] - po[None, :, 1] * e[None, :, 0]) / safe
    u = (po[None, :, 0] * d[:, None, 1] - po[None, :, 1] * d[:, None, 0]) / safe
    # Front-facing: the quad's front side must face the ray (same cull as
    # the rasterizer's backface test). Sprite quads always face the camera.
    facing = denom > 0.0
    valid = (
        (jnp.abs(denom) >= 1e-12)
        & facing
        & (t > pcfg.near)
        & (t < pcfg.far)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    # Invalid crossings carry a LARGE FINITE depth sentinel, not inf:
    # the crossing-compaction one-hot matmul multiplies every row by
    # 0/1, and 0 * inf = NaN. Valid depths are < player.far (100), so
    # any t >= BIG_T/10 is the sentinel.
    td = jnp.where(valid, t, BIG_T)
    # Multi-operand sort carries (t, u, id) through the sorting network
    # together -- XLA gathers (take_along_axis on an argsort) cost ~8 ns
    # per element on TPU, ~4x the sort itself.
    sd_ids = jnp.broadcast_to(
        jnp.arange(td.shape[1], dtype=jnp.int32)[None, :], td.shape
    )
    td_s, u_s, id_s = jax.lax.sort(
        (td, u, sd_ids), dimension=1, num_keys=1, is_stable=True
    )
    t_k = td_s[:, :n_cross]  # (W, K)
    u_k = u_s[:, :n_cross]
    order = id_s[:, :n_cross]

    idx = order.T  # (K, W)
    t = t_k.T
    uf = u_k.T
    SD = table.shape[0]

    valid = t < BIG_T / 10.0
    safe_t = jnp.where(valid, t, 1.0)

    # Attribute selection backend. The einsum path materializes a
    # (K, W, SD) f32 one-hot in HBM and streams it through THREE
    # contractions (prefix cols, full attributes, seg-live) -- at
    # real-WAD seg counts that HBM traffic dominates the whole walk
    # (~18 MB/env at SD=590; measured ~55 of 98 ms/tick at B=64 on
    # :texstress:). The SELECT-KERNEL path (ops/raster_pallas.
    # select_rows_pallas) builds the one-hot block-by-block in VMEM and
    # selects ALL attribute columns in one pass -- bit-exact (3-way
    # bf16-split table, see split3_bf16) and only valid when crossing
    # compaction is off (idx must be the same for prefix + full reads).
    K_c = _resolve_compact_crossings(cfg, SD_full)
    use_sel = bool(select_kernel) and K_c == 0 and SD_full > 192
    if use_sel:
        from ..ops.raster_pallas import select_rows_pallas, split3_bf16

        Sp = -(-SD // 128) * 128
        tab3 = split3_bf16(jnp.pad(table, ((0, Sp - SD), (0, 0))))
        N = idx.size  # n_cross * W
        Np = -(-N // 128) * 128
        idx_flat = idx.reshape(-1)
        if Np != N:
            idx_flat = jnp.pad(idx_flat, (0, Np - N))
        vals_cn = select_rows_pallas(
            idx_flat, tab3, interpret=(select_kernel == "interpret")
        )[:, :N]  # (C, N) exact f32
        col = lambda c: vals_cn[c].reshape(n_cross, W)
        onehot = None
        hb_p = col(0) > 0.5
        solid_p = col(20) > 0.5
        r_fc_p = row_of(col(7), safe_t)
        r_ff_p = row_of(col(8), safe_t)
        row_bc = row_of(col(9), safe_t)
        row_bf = row_of(col(10), safe_t)
    else:
        onehot = (
            idx[..., None] == jnp.arange(SD)[None, None, :]
        ).astype(jnp.float32)
        # --- prefix einsum: only the 6 columns the clip-window needs ---
        # precision=HIGHEST is REQUIRED for exactness: jax's default
        # matmul precision truncates f32 operands to bf16 (even on CPU),
        # which mangles every table column needing >8 mantissa bits
        # (compact-table cbase offsets, texture coords, tall heights).
        # HIGHEST runs the multi-pass exact-f32 MXU mode; with one-hot
        # rows the select is then bit-exact.
        PREFIX_COLS = (0, 7, 8, 9, 10, 20)  # has_back, 4 heights, solid
        svals = jnp.einsum(
            "kws,sc->kwc", onehot, table[:, PREFIX_COLS],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K, W, 6)
        hb_p = svals[..., 0] > 0.5
        solid_p = svals[..., 5] > 0.5
        r_fc_p = row_of(svals[..., 1], safe_t)
        r_ff_p = row_of(svals[..., 2], safe_t)
        row_bc = row_of(svals[..., 3], safe_t)
        row_bf = row_of(svals[..., 4], safe_t)

    # Clip-window prefix: crossing k contributes its ceiling row (and, for
    # portals, the back-ceiling row) to every later crossing's top, and
    # symmetrically for bot. Invalid and NON-SOLID (sprite/masked)
    # crossings contribute identities -- masked surfaces never occlude.
    vs = valid & solid_p
    step_top = jnp.where(
        vs, jnp.where(hb_p, jnp.maximum(r_fc_p, row_bc), r_fc_p), NEG
    )
    step_bot = jnp.where(
        vs, jnp.where(hb_p, jnp.minimum(r_ff_p, row_bf), r_ff_p), POS
    )
    cum_top = jax.lax.cummax(step_top, axis=0)
    cum_bot = jax.lax.cummin(step_bot, axis=0)
    # Exclusive prefix (window BEFORE crossing k), seeded with [0, H).
    top = jnp.maximum(
        0.0, jnp.concatenate([jnp.full((1, W), NEG), cum_top[:-1]], axis=0)
    )
    bot = jnp.minimum(
        float(H), jnp.concatenate([jnp.full((1, W), POS), cum_bot[:-1]], axis=0)
    )
    top1_p = jnp.where(solid_p, jnp.maximum(top, r_fc_p), top)
    bot1_p = jnp.where(solid_p, jnp.minimum(bot, r_ff_p), bot)

    # done/live prefix: a column stops at its first solid wall or shut
    # window (or when it runs out of crossings).
    new_top = jnp.where(hb_p, jnp.maximum(top1_p, row_bc), top1_p)
    new_bot = jnp.where(hb_p, jnp.minimum(bot1_p, row_bf), bot1_p)
    blocker = (vs & (~hb_p | (new_top >= new_bot))) | ~valid
    blocked = jax.lax.cummax(blocker.astype(jnp.int32), axis=0) > 0
    done_before = jnp.concatenate(
        [jnp.zeros((1, W), bool), blocked[:-1]], axis=0
    )
    live = valid & ~done_before

    # --- crossing compaction -------------------------------------------
    # Everything downstream (the full attribute einsum, 5 record
    # families, the masked alpha-word fetch, and the render kernel's
    # classify loop) scales with the crossing count, but only crossings
    # that are LIVE in some column can contribute pixels -- typically
    # 2-4 of the portal_crossings budget. Compact (t, u, id, live, top,
    # bot) to the first K_c live crossings with an exact stable one-hot
    # select; frames with more live crossings than the budget set
    # aux["overflow"] and are rendered by the triangle path instead
    # (exactly like the pitch fallback -- the triangle path is the
    # oracle, so deep scenes stay exact). (K_c resolved above, where
    # the selection backend is chosen.)
    if 0 < K_c < n_cross:
        live_k = jnp.any(live, axis=1)  # (K,)
        overflow = jnp.sum(live_k) > K_c
        ordk = jnp.argsort(
            (~live_k).astype(jnp.int32), stable=True
        )[:K_c]  # (K_c,) live crossings first, front-to-back order kept
        ohk = (ordk[:, None] == jnp.arange(n_cross)[None, :]).astype(
            jnp.float32
        )
        packed = jnp.concatenate(
            [t, uf, idx.astype(jnp.float32), live.astype(jnp.float32),
             top, bot],
            axis=1,
        )  # (K, 6W)
        sel = jnp.einsum(
            "ck,kx->cx", ohk, packed, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # exact f32 row select (finite inputs by construction)
        t, uf = sel[:, :W], sel[:, W : 2 * W]
        idx = sel[:, 2 * W : 3 * W].astype(jnp.int32)
        live = sel[:, 3 * W : 4 * W] > 0.5
        top, bot = sel[:, 4 * W : 5 * W], sel[:, 5 * W : 6 * W]
        valid = t < BIG_T / 10.0
        safe_t = jnp.where(valid, t, 1.0)
        onehot = (
            idx[..., None] == jnp.arange(SD)[None, None, :]
        ).astype(jnp.float32)
        K_eff = K_c
    else:
        overflow = jnp.zeros((), bool)
        K_eff = n_cross
    overflow = overflow | overflow_vis

    c0m = PIECE0 + 1 * PIECE_C  # middle piece (the only masked family)

    def alpha_words(uu_m, tsx_m, ax_m, sprite_f):
        """Masked alpha words (K, n_words, W): the texture u is fixed
        down a screen column, so a masked record's alpha data is ONE
        texture column = n_words u32 words, fetched with a one-hot MXU
        matmul over the (2*wc) packed column table (bytes are exact in
        bf16). An r5 experiment routed this through the VMEM select
        kernel (expecting to save the one-hot's HBM footprint); it
        measured NEUTRAL on :texstress: (1483 vs 1493 env-fps) -- XLA
        fuses the one-hot into the matmul -- and 32 unrolled Mosaic
        select instances pushed the small-level compile past 20
        minutes, so the einsum stays."""
        alpha_cols = pt["alpha_cols"]  # (2*wc, 4*n_words) byte planes
        two_wc = alpha_cols.shape[0]
        wc = two_wc // 2
        u1 = jnp.mod(uu_m, jnp.where(tsx_m == 0.0, 1.0, tsx_m)) + ax_m
        x_t = jnp.mod(jnp.floor(u1).astype(jnp.int32), wc)
        col_idx = x_t + jnp.where(sprite_f, wc, 0)  # decor plane offset
        oh = (
            col_idx[..., None] == jnp.arange(two_wc)[None, None, :]
        ).astype(jnp.bfloat16)
        by = jnp.einsum(
            "kwc,cn->kwn", oh, alpha_cols.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (K, W, 4*n_words); bytes <= 255 are exact through bf16
        b = [by[..., s::4].astype(jnp.int32) for s in range(4)]
        return (
            b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
        ).transpose(0, 2, 1)

    # --- active-set allocation (big-texture levels; see docstring) -----
    if active_segs:
        C = pt["cell_gseg0"].shape[0]
        live_f = live.astype(jnp.float32)
        # Visible segs -> visible cells (one MXU pass each; exact 0/1).
        if use_sel:
            from ..ops.raster_pallas import scatter_live_pallas

            live_flat = live_f.reshape(-1)
            if Np != N:
                live_flat = jnp.pad(live_flat, (0, Np - N))
            seg_live_f = scatter_live_pallas(
                idx_flat, live_flat, Sp,
                interpret=(select_kernel == "interpret"),
            )[:SD]
        else:
            seg_live_f = jnp.einsum(
                "kw,kws->s", live_f, onehot,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (Sv,) counts > 0 where live
        if vis_oh is not None:
            # Map live counts back to ORIGINAL seg space (cell_m is
            # indexed by original seg id): vis_oh rows are one-hot over
            # SD_full, so this scatters compacted rows home.
            seg_live_f = jnp.einsum(
                "v,vs->s", seg_live_f, vis_oh,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (SD_full,)
        seg_live = seg_live_f > 0.5
        cell_vis = (
            seg_live.astype(jnp.float32) @ pt["cell_m"]
        ) > 0.5  # (C,)
        nseg_act = jnp.where(cell_vis, pt["cell_nsegs"], 0.0)
        # Slots allocate in 8-segment blocks: the gather kernel's
        # dynamic-offset (8, 128) stores need destination row offsets
        # that are provable multiples of 8 (Mosaic sublane tiling), so
        # slot_start must be exactly the running block total. Source
        # bases are 8-aligned at pack time (_pack_compact_cells).
        nblk8 = jnp.where(cell_vis, jnp.ceil(nseg_act / 8.0), 0.0)
        nseg_slot = nblk8 * 8.0
        cum = jnp.cumsum(nseg_slot)
        slot_start = cum - nseg_slot  # exclusive prefix (f32, exact)
        overflow = overflow | (cum[-1] > float(active_segs))
        # Overflowing envs fall back to the exact triangle path, but the
        # gather kernel still RUNS on their meta (the fallback replaces
        # pixels after the fact) -- clamp each cell's block count so
        # every write lands inside the (active_segs + 8)-row output
        # buffer. An unclamped slot offset is an out-of-bounds VMEM
        # store: real TPU workers FAULT on it (the r4 "tuned texstress"
        # worker crash) while interpret mode silently accepts it.
        max_blk = float(active_segs // 8)
        nblk_safe = jnp.clip(
            jnp.minimum(nblk8, max_blk - slot_start / 8.0), 0.0, None
        )
        slot_safe = jnp.minimum(slot_start / 8.0, max_blk)
        # Meta in 8-row BLOCK units (gseg0 is 8-aligned at pack time,
        # slot_start by construction above): the gather kernel writes
        # its offsets as blk * 8 so Mosaic can statically prove the
        # (8, 128) vector load/store alignment.
        gather_meta = jnp.stack(
            [pt["cell_gseg0"] / 8.0, slot_safe, nblk_safe], axis=-1
        ).astype(jnp.int32)  # (C, 3)

        def remap_cb(cb, cid):
            ci = jnp.clip(cid.astype(jnp.int32), 0, C - 1)
            shift = (
                jnp.take(slot_start, ci) - jnp.take(pt["cell_gseg0"], ci)
            ) * 128.0
            return jnp.where(cid < 0.0, 0.0, cb + shift)
    else:
        gather_meta = None
        remap_cb = lambda cb, cid: cb

    # --- full attribute selection (at the compacted crossing count) ----
    if not use_sel:
        vals = jnp.einsum(
            "kws,sc->kwc", onehot, table,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K_eff, W, C)
        col = lambda c: vals[..., c]
    # else: `col` already reads the select kernel's one full-column pass
    # (K_c == 0 guarantees idx is unchanged since the prefix read).

    hb = col(0) > 0.5
    solid = col(20) > 0.5
    sprite = col(21) > 0.5
    fc, ff = col(1), col(2)
    fcs, ffs = col(3) > 0.5, col(4) > 0.5
    bcs, bfs = col(5) > 0.5, col(6) > 0.5
    light_flat = col(11)

    # Recomputed (identical formulas/inputs) at the compacted count.
    r_fc = row_of(col(7), safe_t)
    r_ff = row_of(col(8), safe_t)
    top1 = jnp.where(solid, jnp.maximum(top, r_fc), top)
    bot1 = jnp.where(solid, jnp.minimum(bot, r_ff), bot)

    recs = []  # RECORDS_PER_CROSSING record families, each (K_eff, NCH, W)

    def rec(y0, y1, kind, p0=0.0, ab=None, light=0.0, w=0.0,
            t1=0.0, t2=0.0, low=0.0, high=0.0, masked=0.0, cbase=0.0,
            ok=None):
        ch = [None] * NCH
        zero = jnp.zeros((K_eff, W), jnp.float32)
        ok_ = ok if ok is not None else jnp.ones((K_eff, W), bool)
        # EVERY channel is gated by ok_: dead records must carry finite
        # zeros, not leftovers like w = t = INF from invalid crossings --
        # a first-match classify never reads them, but the crossing-
        # compaction one-hot matmul multiplies every record by 0/1 and
        # 0 * inf poisons the select with NaNs.
        gate = lambda v: jnp.where(ok_, v, 0.0) + zero
        ch[R_Y0] = jnp.where(ok_, y0, 1e9) + zero
        ch[R_Y1] = jnp.where(ok_, y1, -1e9) + zero
        ch[R_KIND] = jnp.where(ok_, kind, KIND_NONE) + zero
        ch[R_P0] = gate(p0)
        if ab is None:
            for c in (R_AX, R_AY, R_TSX, R_TSY):
                ch[c] = zero
        else:
            ch[R_AX], ch[R_AY] = gate(ab[0]), gate(ab[1])
            ch[R_TSX], ch[R_TSY] = gate(ab[2]), gate(ab[3])
        ch[R_MASKED] = jnp.where(ok_, masked, 0.0) + zero
        ch[R_CBASE] = gate(cbase)
        ch[R_LIGHT] = gate(light)
        ch[R_W] = gate(w)
        ch[R_T1] = gate(t1)
        ch[R_T2] = gate(t2)
        ch[R_LOW] = gate(low)
        ch[R_HIGH] = gate(high)
        recs.append(jnp.stack(ch, axis=1))  # (K, NCH, W)

    # Ceiling span: front sector ceiling flat (or sky). Sky ceilings are
    # planes at hmax (the reference's sky polys), so the flat span
    # [top, min(bot, r_fc)) is empty for them (r_fc = row of hmax, far
    # above the screen); the walker's SKY BAND at a sky->nonsky boundary
    # ([top1, row(fc)) in the sequential formulation, ref visitor.rs
    # sky quads; also on one-sided segs) is folded in by extending the
    # span there -- exact because for fcs the flat part is empty,
    # top1 == top, and sky shading ignores every record field. Only
    # solid (seg) crossings emit flats.
    band_c = fcs & (~hb | ~bcs)
    rec(top,
        jnp.where(band_c,
                  jnp.minimum(bot1, row_of(fc, safe_t)),
                  jnp.minimum(bot, r_fc)),
        jnp.where(fcs, KIND_SKY, KIND_FLAT),
        p0=col(7), ab=(col(12), col(13), col(14), col(15)),
        light=light_flat, cbase=remap_cb(col(22), col(24)),
        ok=live & solid)
    # Floor span [max(top, r_ff), bot), with the floor-side sky band
    # ([max(top1, row(ff)), bot1)) folded in symmetrically.
    band_f = ffs & (~hb | ~bfs)
    rec(jnp.where(band_f,
                  jnp.maximum(top1, row_of(ff, safe_t)),
                  jnp.maximum(top, r_ff)),
        jnp.where(band_f, bot1, bot),
        jnp.where(ffs, KIND_SKY, KIND_FLAT),
        p0=col(8), ab=(col(16), col(17), col(18), col(19)),
        light=light_flat, cbase=remap_cb(col(23), col(25)),
        ok=live & solid)
    # Wall pieces + sprites. u texel coordinate: s1 + (s2-s1)*u_frac +
    # scroll*time (the time term is folded into the table's "a" column).
    # Masked pieces (transparent middles, sprites) draw as records whose
    # per-pixel match additionally requires the texel alpha bit.
    for pi, piece in enumerate(("lower", "middle", "upper")):
        c0 = PIECE0 + pi * PIECE_C
        pe = col(c0) > 0.5
        masked = col(c0 + 13) > 0.5
        draw = live & pe
        plow, phigh = col(c0 + 2), col(c0 + 3)
        uu = col(c0 + 4) + col(c0 + 5) * uf
        kind = (
            jnp.where(sprite, KIND_DECOR, KIND_WALL)
            if piece == "middle"
            else KIND_WALL
        )
        rec(jnp.maximum(top1, row_of(phigh, safe_t)),
            jnp.minimum(bot1, row_of(plow, safe_t)),
            kind, p0=uu,
            ab=(col(c0 + 9), col(c0 + 10), col(c0 + 11), col(c0 + 12)),
            light=col(c0 + 8), w=t,
            t1=col(c0 + 6), t2=col(c0 + 7),
            low=plow, high=phigh,
            masked=masked.astype(jnp.float32),
            cbase=remap_cb(col(c0 + 14), col(c0 + 15)),
            ok=draw)

    # --- masked alpha words (K, n_words, W) --------------------------------
    words = alpha_words(
        col(c0m + 4) + col(c0m + 5) * uf, col(c0m + 11), col(c0m + 9),
        sprite,
    )

    # (K_eff, 5, NCH, W) -> (R, NCH, W): record order is crossing-major
    # (front-to-back), family-minor -- identical to the sequential walk.
    rec_k = jnp.stack(recs, axis=1)
    records = rec_k.reshape(K_eff * RECORDS_PER_CROSSING, NCH, W)
    aux = dict(
        cam=jnp.stack([cx, cyw, cz]), d=d, sy=sy_, cy=cy_,
        sp=sp_, cp=cp_, shear=shear_ndc, overflow=overflow,
    )
    if gather_meta is not None:
        aux["gather_meta"] = gather_meta
    return records, words, aux


def _alpha_test(records_r, words_k, rows, cam_y, p11, hc, height, shear=0.0):
    """Per-pixel alpha bit for ONE masked record: (H_tile, W) bool.
    records_r: (NCH, W); words_k: (n_words, W) i32; rows: (H_tile, 1)
    image rows. Mirrors the kernel's in-register math and the shading
    texel coords exactly (raster_jnp texel rounding). `shear` is the
    env's pitch shear in ndc units (0 at zero pitch)."""
    H = height
    ndc_y = 1.0 - 2.0 * rows / H + shear  # rows are (j + 0.5)
    w_ch = records_r[R_W][None, :]
    h_at = cam_y + ndc_y * w_ch / p11
    low, high = records_r[R_LOW][None, :], records_r[R_HIGH][None, :]
    dh = high - low
    dh = jnp.where(dh == 0.0, 1.0, dh)
    t1, t2 = records_r[R_T1][None, :], records_r[R_T2][None, :]
    v = t1 + (t2 - t1) * (h_at - low) / dh
    tsy = records_r[R_TSY][None, :]
    vv = jnp.mod(v, jnp.where(tsy == 0.0, 1.0, tsy)) + records_r[R_AY][None, :]
    y_t = jnp.mod(jnp.floor(vv).astype(jnp.int32), hc)
    wi = y_t >> 5
    bit = y_t & 31
    n_words = words_k.shape[0]
    wsel = jnp.zeros_like(y_t)
    for w in range(n_words):
        wsel = jnp.where(wi == w, words_k[w][None, :], wsel)
    return ((wsel >> bit) & 1) == 1


def _alpha_mask_env(records, words, height, cam_y, p11, hc, shear=0.0):
    """Per-crossing masked-record match mask (K, H, W) f32: 1 where the
    crossing's MIDDLE-family record may match a pixel -- its texel alpha
    bit for masked columns (sprites, transparent middles), 1 for solid
    columns. Computed densely in XLA (cheap VPU math) so the classify
    kernel only ANDs it in for the masked family."""
    K = words.shape[0]
    W = records.shape[2]
    rows = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5  # (H, 1)
    rec_mid = records.reshape(K, RECORDS_PER_CROSSING, NCH, W)[:, MASKED_FAMILY]

    def one(rec, wk):
        alpha = _alpha_test(rec, wk, rows, cam_y, p11, hc, height, shear)
        masked = rec[R_MASKED][None, :] > 0.5
        # bf16: the mask is 0/1 (exact) and large at big batches.
        return jnp.where(masked, alpha, True).astype(jnp.bfloat16)

    return jax.vmap(one)(rec_mid, words)  # (K, H, W)


def _classify_jnp(records, alpha_mask, height):
    """First-match span classification (jnp reference for the Pallas
    kernel in tpu_doom.ops): (R, NCH, W) -> (NCH, H, W); kind channel is 0
    where nothing matched. Middle-family records AND in the precomputed
    alpha mask (masked records match only on opaque texels)."""
    H = height
    W = records.shape[2]
    rows = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5  # (H, 1)
    K = alpha_mask.shape[0]
    rec_k = records.reshape(K, RECORDS_PER_CROSSING, NCH, W)

    def body(carry, inp):
        rk, mk = inp  # (7, NCH, W), (H, W)
        done, out = carry
        for fam in range(RECORDS_PER_CROSSING):
            r = rk[fam]
            hit = ~done & (rows >= r[R_Y0][None, :]) & (rows < r[R_Y1][None, :])
            if fam == MASKED_FAMILY:  # the masked (middle/sprite) family
                hit = hit & (mk > 0.5)
            out = jnp.where(hit[None], r[:, None, :], out)
            done = done | hit
        return (done, out), None

    carry0 = (
        jnp.zeros((H, W), bool),
        jnp.zeros((NCH, H, W), jnp.float32),
    )
    (_, ch), _ = jax.lax.scan(body, carry0, (rec_k, alpha_mask))
    return ch


def _sky_image(pt, scene, cfg, width, height, sy_, cy_, sp_=0.0, cp_=1.0):
    """Per-env colormapped sky image (H, W) f32 for the kernel shade
    path. The sky texel coordinates are row/column SEPARABLE (sky_u
    varies only along x, sky_v only along y -- sky.vert/sky.frag), so
    the image is two cheap row-gather takes instead of a per-pixel
    lookup. Formulas mirror _shade_portal's sky block exactly, including
    the exact pitched view direction (mv column 2 of R_y(yaw)R_x(pitch)
    is (-sy, cy*sp, cy*cp)), so sky pixels are exact under shear."""
    pcfg = cfg.player
    H, W = height, width
    f = 1.0 / jnp.tan(jnp.float32(math.radians(cfg.fov)) / 2.0)
    aspect = (W / H) * pcfg.aspect_ratio_correction
    p00 = f / aspect
    p11 = f
    r1z = cy_ * sp_
    r2z = cy_ * cp_
    far, near = pcfg.far, pcfg.near
    c22 = (far + near) / (near - far)
    fwd_x = p00 * (-sy_)
    fwd_z = c22 * r2z
    fwd_w = -r2z
    v_r0 = jnp.arctan2(fwd_x, fwd_z)
    v_r1 = (p11 * r1z) / jnp.where(fwd_w == 0.0, 1.0, fwd_w)
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    ndc_x = xs / (0.5 * W) - 1.0
    ndc_yf = ys / (0.5 * H) - 1.0
    sky_u = ndc_x - 4.0 * v_r0 / jnp.float32(math.pi)  # (W,)
    sky_v = -ndc_yf + 1.0 + v_r1  # (H,)
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
    tex = pt["sky_tex"].astype(jnp.float32)  # (hs, ws)
    rows = jnp.take(tex, sky_y, axis=0)  # (H, ws) -- row gathers
    return jnp.take(rows.T, sky_x, axis=0).T  # (H, W)


def _shade_portal(pt, scene, cfg, width, height, ch, aux, object_offset, time):
    """Fragment shading from classified channels (NCH, H, W): ONE combined
    colormapped atlas take resolves texel + transparency + colormap + sky
    for every pixel (walls, flats, sky, sprites, masked middles)."""
    pcfg = cfg.player
    H, W = height, width
    f = 1.0 / jnp.tan(jnp.float32(math.radians(cfg.fov)) / 2.0)
    aspect = (W / H) * pcfg.aspect_ratio_correction
    p00 = f / aspect
    p11 = f
    cx, cyw, cz = aux["cam"][0], aux["cam"][1], aux["cam"][2]
    d = aux["d"]
    sy_, cy_ = aux["sy"], aux["cy"]
    sp_, cp_ = aux.get("sp", 0.0), aux.get("cp", 1.0)
    shear = aux.get("shear", 0.0)
    rows = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    covered = ch[R_KIND] != KIND_NONE

    # --- shading -----------------------------------------------------------
    kind = ch[R_KIND]
    # Geometry ndc-y: screen ndc plus the pitch shear (records were
    # emitted with sheared rows, so the inverse mappings shear back).
    ndc_y = (1.0 - (rows / H) * 2.0 + shear) * jnp.ones((H, W))
    # Flats: depth from plane height.
    plane_h = ch[R_P0]
    safe_ndc = jnp.where(jnp.abs(ndc_y) < 1e-9, 1e-9, ndc_y)
    t_flat = p11 * (plane_h - cyw) / safe_ndc
    hit_x = cx + d[None, :, 0] * t_flat
    hit_z = cz + d[None, :, 1] * t_flat
    flat_u = -hit_x * 100.0
    flat_v = -hit_z * 100.0
    # Walls/sprites: v from world height at the pixel row.
    h_at = cyw + ndc_y * ch[R_W] / p11
    denom_h = ch[R_HIGH] - ch[R_LOW]
    denom_h = jnp.where(denom_h == 0.0, 1.0, denom_h)
    wall_v = ch[R_T1] + (ch[R_T2] - ch[R_T1]) * (h_at - ch[R_LOW]) / denom_h
    is_sky = kind == KIND_SKY
    is_wall = kind == KIND_WALL
    is_decor = kind == KIND_DECOR
    wall_like = is_wall | is_decor
    uu = jnp.where(wall_like, ch[R_P0], flat_u)
    vv = jnp.where(wall_like, wall_v, flat_v)
    ts_x = jnp.where(ch[R_TSX] == 0.0, 1.0, ch[R_TSX])
    ts_y = jnp.where(ch[R_TSY] == 0.0, 1.0, ch[R_TSY])
    uu = jnp.mod(uu, ts_x) + ch[R_AX]
    vv = jnp.mod(vv, ts_y) + ch[R_AY]
    w_pix = jnp.where(
        wall_like | (is_sky & (ch[R_W] > 0.0)), ch[R_W], t_flat
    )

    light = ch[R_LIGHT]
    # static.frag:24-26 vs sprite.frag:24-26 light rules.
    dist_term_s = jnp.minimum(1.0, 1.0 - 0.9 / (w_pix + 0.9))
    dist_term_d = jnp.minimum(1.0, 1.0 - 1.0 / (w_pix + 1.0))
    lval_s = light * 2.0 - dist_term_s
    lval_d = jnp.minimum(light, light * 2.0 - dist_term_d)
    lval = jnp.where(is_decor, lval_d, lval_s)
    n_rows = scene.palette_lut.shape[0]
    crow = jnp.clip(jnp.floor((1.0 - lval) * n_rows).astype(jnp.int32), 0, n_rows - 1)

    # Sky texel coordinates (same formulas as the triangle path).
    grid = _pixel_grid(W, H)
    # v_r from pvm[:,2] = proj @ (third column of R^T) = proj @ (row 2 of
    # R_y(yaw) R_x(pitch)) = proj @ (-sin yaw, cy*sp, cy*cp, 0)
    # (sky.vert) -- exact under shear, since v_r is screen-constant.
    r0z, r1z, r2z = -sy_, cy_ * sp_, cy_ * cp_
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

    plane = jnp.where(
        is_sky, 3, jnp.where(is_decor, 2, jnp.where(is_wall, 1, 0))
    ).astype(jnp.int32)
    wrap_h = jnp.where(
        is_sky, dims[3, 0],
        jnp.where(is_decor, dims[2, 0], jnp.where(is_wall, dims[1, 0], dims[0, 0])),
    )
    wrap_w = jnp.where(
        is_sky, dims[3, 1],
        jnp.where(is_decor, dims[2, 1], jnp.where(is_wall, dims[1, 1], dims[0, 1])),
    )
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
    return index, covered


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_frames_portal(pscene, scene, cfg: GameConfig, state, width, height):
    """(indices (B, H, W) u8, covered (B, H, W) bool) via the portal path.

    Envs with nonzero pitch fall back to the triangle path (module
    docstring); everything else renders through the column walk.

    Kernel selection: raster_backend "portal" uses the Pallas classify
    kernel on TPU (jnp fallback elsewhere); "portal_interpret" forces the
    kernel in interpret mode (CI coverage of the TPU code path on CPU);
    "portal_jnp" forces the pure-jnp fallback everywhere."""
    idx, cov, overflow = _render_portal_zero_pitch(
        pscene, scene, cfg, state, width, height
    )

    # Triangle-path fallback (exact, per env): envs whose live-crossing
    # count overflowed the compaction budget (see _walk_env), plus
    # pitched envs when portal_pitch="triangle" (with the default
    # "shear" mode pitched envs stay on the column walk).
    import dataclasses as _dc

    from .raster_jnp import render_frames

    if getattr(cfg, "portal_pitch", "shear") == "triangle":
        pitched = jnp.abs(state.pitch) > PITCH_EPS  # (B,)
        fall = pitched | overflow  # (B,)
    else:
        fall = overflow
    tri_backend = "jnp" if cfg.raster_backend == "portal_jnp" else "auto"
    tri_cfg = _dc.replace(cfg, raster_backend=tri_backend)

    def tri_path(_):
        return render_frames(scene, tri_cfg, state, width, height)

    def no_tri(_):
        return jnp.zeros_like(idx), jnp.zeros_like(cov)

    idx_t, cov_t = jax.lax.cond(jnp.any(fall), tri_path, no_tri, None)
    sel = fall[:, None, None]
    return jnp.where(sel, idx_t, idx), jnp.where(sel, cov_t, cov)


def _render_portal_zero_pitch(pscene, scene, cfg: GameConfig, state, width,
                              height):
    """The column-walk path proper (pitch rendered as y-shear)."""
    n_cross = int(cfg.portal_crossings)
    interpret = cfg.raster_backend == "portal_interpret"
    use_kernels = interpret or (
        jax.default_backend() in ("tpu", "axon")
        and cfg.raster_backend != "portal_jnp"
    )

    p11 = 1.0 / math.tan(math.radians(cfg.fov) / 2.0)
    hc = pscene["alpha_meta"][0]
    S1 = pscene["tex_i8"].shape[0] if "tex_i8" in pscene else 1 << 30
    # Active-set mode: the compact table exceeds the per-pixel lookup
    # budget (real-WAD texture volume); gather each env's visible cells
    # into a bounded per-env table instead (see _walk_env docstring).
    cap = int(getattr(cfg, "portal_global_segs_max", 1024))
    act = (
        int(getattr(cfg, "portal_active_segs", 1536))
        if (use_kernels and S1 > cap and "tex_full" in pscene) else 0
    )

    # Select-kernel backend for the walk: replaces the HBM-materialized
    # one-hot einsums (attribute selection on big-seg levels, the masked
    # alpha-word fetch everywhere); the jnp oracle keeps the einsum path
    # so the two stay independently-computed diff targets. The
    # attribute select itself additionally requires S+D > 192 and
    # crossing compaction off (see _walk_env use_sel).
    sel = ""
    if use_kernels and getattr(cfg, "portal_select_rows", "auto") != "off":
        sel = "interpret" if interpret else "pallas"

    def walk(pos, yaw, pitch, off, t):
        return _walk_env(
            pscene, scene, cfg, width, height, n_cross,
            pos, yaw, pitch, off, t, active_segs=act, select_kernel=sel,
        )

    records, words, aux = jax.vmap(walk)(
        state.pos, state.yaw, state.pitch, state.object_offset, state.time
    )  # records: (B, R, NCH, W); words: (B, K, n_words, W)

    # Fused classify+shade kernel on XLA-built records -- the (B, 11, H,
    # W) classified-channel image stays in VMEM (the two-kernel pipeline
    # round-trips it through HBM) and the ray/sky operands shrink to
    # per-column/per-tile blocks. Small levels use the global compact
    # texel table directly; big levels the per-env active tables.
    if use_kernels and (act or S1 <= cap):
        from ..ops.raster_pallas import (
            gather_cells_pallas,
            render_portal_fused_pallas,
        )

        H, W = height, width
        dxz = aux["d"].transpose(0, 2, 1)  # (B, 2, W)
        sky_img = jax.vmap(
            lambda sy, cy, sp, cp: _sky_image(
                pscene, scene, cfg, W, H, sy, cy, sp, cp)
        )(aux["sy"], aux["cy"], aux["sp"], aux["cp"])  # (B, H, W)
        n_rows = scene.palette_lut.shape[0]
        holeless = "hole_bytes" not in pscene  # static (pytree structure)
        hole_tab = (
            jnp.full((1, 128), -128, jnp.int8) if holeless
            else pscene["hole_bytes"]
        )
        if act:
            tex_tab = gather_cells_pallas(
                aux["gather_meta"], pscene["tex_full"], act,
                interpret=interpret,
            )  # (B, act, 128) bf16; holes ride value 256
        else:
            tex_tab = pscene["tex_i8"]

        tile_h = int(cfg.portal_tile_h)
        if tile_h < 0:  # AUTO (see config): exact-tiling 40 when possible
            tile_h = 40 if height % 40 == 0 else 32
        idx_f, cov_f = render_portal_fused_pallas(
            records, words, aux["cam"], hc, dxz, sky_img,
            tex_tab, hole_tab, pscene["cmap_i8"],
            H, p11, n_rows, tile_h=tile_h,
            interpret=interpret, holeless=holeless, shear=aux["shear"],
            per_env_tex=bool(act),
            hole_ranges=(
                None if (holeless or act) else pscene["hole_ranges"]
            ),
        )
        return idx_f.astype(jnp.uint8), cov_f > 0.5, aux["overflow"]

    # jnp path (and oversized compact tables, which need the full
    # 16-channel records for the combined-atlas take): dense classify,
    # then the one-take shade. The classify KERNEL's 11-channel output
    # deliberately drops the atlas channels this shade needs, so it is
    # only used through the fused path above.
    alpha_mask = jax.vmap(
        lambda r, w, cy, sh: _alpha_mask_env(r, w, height, cy, p11, hc, sh)
    )(records, words, aux["cam"][:, 1], aux["shear"])  # (B, K, H, W)
    ch = jax.vmap(
        lambda r, m: _classify_jnp(r, m, height)
    )(records, alpha_mask)

    def shade(ch_e, cam, d, sy, cy, sp, cp, sh, off, t):
        aux_e = dict(cam=cam, d=d, sy=sy, cy=cy, sp=sp, cp=cp, shear=sh)
        return _shade_portal(
            pscene, scene, cfg, width, height, ch_e, aux_e, off, t
        )

    idx, cov = jax.vmap(shade)(
        ch, aux["cam"], aux["d"], aux["sy"], aux["cy"], aux["sp"],
        aux["cp"], aux["shear"], state.object_offset, state.time,
    )
    return idx, cov, aux["overflow"]
