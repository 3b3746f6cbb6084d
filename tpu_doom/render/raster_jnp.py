"""Software rasterizer: the render path replacing the reference's GL
pipeline (engine/src/renderer.rs + the GLSL in assets/shaders).

Stages (per env, vmapped over the batch):
  1. _prepare_env: vertex processing reproducing static/sky/sprite.vert
     (animation frame select with atlas row wrap, scroll, billboarding),
     homogeneous triangle setup (edge rows, z row, sum row, backface cull).
  2. depth peel: the K nearest (z, draw-order id) layers per pixel.
     Backends: 'jnp' (dense per pixel-block, the semantics reference) or
     'pallas' (tpu_doom.ops fused VMEM kernel). K = cfg.depth_layers
     bounds how many stacked masked surfaces resolve (GL discard writes
     no depth, so the nearest triangle is not always the visible one).
  3. _winner_from_layers: first layer whose texel survives the alpha test.
  4. _shade: fragment shading reproducing static/sprite/sky.frag: atlas
     cell wrap, distance term + light scale -> colormap row, palette LUT,
     sky view-direction band mapping.

Output is Doom-authentic (H, W) uint8 palette indices (colormap applied)
plus a coverage mask; frames_to_rgb maps through PLAYPAL.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..sim.lights import light_table_u8
from ..utils.config import GameConfig
from .camera import camera_matrices

PASS_FLAT, PASS_WALL, PASS_DECOR, PASS_SKY = 0, 1, 2, 3
ANIM_FPS = 8.0 / 35.0  # assets/shaders/static.vert:22
DIST_SCALE_STATIC = 0.9  # static.frag:17
DIST_SCALE_SPRITE = 1.0  # sprite.frag:17
LIGHT_SCALE = 2.0


def _anim_atlas_uv(atlas_uv, tile_size, row_step, num_frames, atlas_w, time):
    """Animation frame select with atlas row wrap (static.vert:27-40 /
    sprite.vert:28-39). row_step is a_row_height for static, tile_size.y
    for sprites. All per-vertex arrays."""
    nf = num_frames.astype(jnp.float32)
    frame = jnp.floor(jnp.mod(time / ANIM_FPS, jnp.maximum(nf, 1.0)))
    atlas_u = atlas_uv[:, 0] + frame * tile_size[:, 0]
    n_rows = jnp.ceil((atlas_u + tile_size[:, 0]) / atlas_w) - 1.0
    safe_ts = jnp.where(tile_size[:, 0] == 0.0, 1.0, tile_size[:, 0])
    atlas_u = atlas_u + jnp.mod(atlas_w - atlas_uv[:, 0], safe_ts) * n_rows
    atlas_v = atlas_uv[:, 1] + n_rows * row_step
    animated = jnp.stack([atlas_u, atlas_v], axis=-1)
    return jnp.where((num_frames == 1)[:, None], atlas_uv, animated)


def _sample_index_alpha(index_img, alpha_img, u, v):
    """NEAREST + REPEAT sampling of a paletted texture in texel units."""
    h, w = index_img.shape
    x = jnp.mod(jnp.floor(u).astype(jnp.int32), w)
    y = jnp.mod(jnp.floor(v).astype(jnp.int32), h)
    idx = index_img[y, x]
    alpha = alpha_img[y, x] if alpha_img is not None else jnp.ones_like(idx, dtype=bool)
    return idx, alpha


def _setup_triangles(clip, tris):
    """Homogeneous rasterization setup. clip: (N, 4) viewport-scaled
    homogeneous (x_w*w, y_w*w, w, z_c); tris: (T, 3) -> per-tri edge rows
    e (T, 3, 3), det (T,), z row vz (T, 3), sum row vs (T, 3)."""
    v = clip[tris]  # (T, 3, 4)
    c = v[..., :3]
    c0, c1, c2 = c[:, 0], c[:, 1], c[:, 2]
    e0 = jnp.cross(c1, c2)
    e1 = jnp.cross(c2, c0)
    e2 = jnp.cross(c0, c1)
    det = jnp.sum(c0 * e0, axis=-1)
    z = v[..., 3]
    vz = z[:, 0, None] * e0 + z[:, 1, None] * e1 + z[:, 2, None] * e2
    vs = e0 + e1 + e2
    e = jnp.stack([e0, e1, e2], axis=1)
    return e, det, vz, vs


def _viewport_homogeneous(clip4, width, height):
    x, y, z, w = clip4[:, 0], clip4[:, 1], clip4[:, 2], clip4[:, 3]
    a = (x + w) * 0.5 * width
    b = (y + w) * 0.5 * height
    return jnp.stack([a, b, w, z], axis=-1)


def _pixel_grid(width, height):
    """(3, P) pixel-center homogeneous coords; image row j is window
    y = height - j - 0.5 (GL origin bottom-left)."""
    i = jnp.arange(width, dtype=jnp.float32) + 0.5
    j = jnp.arange(height, dtype=jnp.float32)
    py = height - j - 0.5
    px = jnp.tile(i, height)
    pyf = jnp.repeat(py, width)
    ones = jnp.ones_like(px)
    return jnp.stack([px, pyf, ones], axis=0)


def _scene_triangles(scene):
    """Static per-level combined triangle tables (pass ids, transparency)."""
    ns, nk = scene.static_pos.shape[0], scene.sky_pos.shape[0]
    tri_list = jnp.concatenate(
        [
            scene.flat_tris,
            scene.wall_tris,
            scene.decor_tris + ns + nk,
            scene.sky_tris + ns,
        ],
        axis=0,
    )
    tf, tw = scene.flat_tris.shape[0], scene.wall_tris.shape[0]
    td, tk = scene.decor_tris.shape[0], scene.sky_tris.shape[0]
    tri_pass = jnp.concatenate(
        [
            jnp.full((tf,), PASS_FLAT, jnp.int32),
            jnp.full((tw,), PASS_WALL, jnp.int32),
            jnp.full((td,), PASS_DECOR, jnp.int32),
            jnp.full((tk,), PASS_SKY, jnp.int32),
        ]
    )
    transparent = jnp.concatenate(
        [
            jnp.zeros((tf,), bool),
            scene.wall_tri_transparent,
            jnp.ones((td,), bool),
            jnp.zeros((tk,), bool),
        ]
    )
    return tri_list, tri_pass, transparent


def _prepare_env(scene, cfg, width, height, pos, yaw, pitch, object_offset, time):
    """Vertex processing + triangle setup for one env."""
    pcfg = cfg.player
    mv, proj = camera_matrices(
        pos,
        yaw,
        pitch,
        camera_height=pcfg.camera_height,
        fovy_rad=math.radians(cfg.fov),
        aspect=(width / height) * pcfg.aspect_ratio_correction,
        near=pcfg.near,
        far=pcfg.far,
    )
    pvm = proj @ mv
    lights_f = light_table_u8(scene, time).astype(jnp.float32) / 255.0

    flats_w = float(scene.flats_atlas.shape[1])
    walls_w = float(scene.walls_atlas_index.shape[1])

    s_pos = scene.static_pos.at[:, 1].add(object_offset[scene.static_object])
    s_clip = s_pos @ pvm[:, :3].T + pvm[:, 3]
    s_tile_uv = scene.static_tile_uv + jnp.stack(
        [time * scene.static_scroll, jnp.zeros_like(scene.static_scroll)], axis=-1
    )
    s_atlas_uv_flat = _anim_atlas_uv(
        scene.static_atlas_uv,
        scene.static_tile_size,
        scene.static_row_height,
        scene.static_num_frames,
        flats_w,
        time,
    )
    s_atlas_uv_wall = _anim_atlas_uv(
        scene.static_atlas_uv,
        scene.static_tile_size,
        scene.static_row_height,
        scene.static_num_frames,
        walls_w,
        time,
    )

    k_pos = scene.sky_pos.at[:, 1].add(object_offset[scene.sky_object])
    k_clip = k_pos @ pvm[:, :3].T + pvm[:, 3]

    # Billboard along camera right = row 0 of modelview (sprite.vert:40-41).
    right = mv[0, :3]
    d_pos = scene.decor_pos.at[:, 1].add(object_offset[scene.decor_object])
    d_pos = d_pos + right[None, :] * scene.decor_local_x[:, None]
    d_clip = d_pos @ pvm[:, :3].T + pvm[:, 3]

    ns, nk = s_clip.shape[0], k_clip.shape[0]
    clip = jnp.concatenate([s_clip, k_clip, d_clip], axis=0)
    clip = _viewport_homogeneous(clip, width, height)

    zeros2 = jnp.zeros((nk, 2), dtype=jnp.float32)
    tile_uv = jnp.concatenate([s_tile_uv, zeros2, scene.decor_tile_uv], axis=0)
    atlas_uv_a = jnp.concatenate(
        [s_atlas_uv_flat, zeros2, scene.decor_atlas_uv], axis=0
    )
    atlas_uv_b = jnp.concatenate(
        [s_atlas_uv_wall, zeros2, scene.decor_atlas_uv], axis=0
    )
    tile_size = jnp.concatenate(
        [scene.static_tile_size, zeros2, scene.decor_tile_size], axis=0
    )
    zi = jnp.zeros((nk,), dtype=jnp.int32)
    light_idx = jnp.concatenate([scene.static_light, zi, scene.decor_light], axis=0)

    tri_list, tri_pass, transparent = _scene_triangles(scene)
    e, det, vz, vs = _setup_triangles(clip, tri_list)
    # Backface cull: clockwise (in window coords) culled, renderer.rs:49-57.
    det = jnp.where(det > 0.0, det, 0.0)

    # Per-triangle window-y bounds (for the kernel's sorted-chunk culling);
    # conservative full range when any vertex is at/behind the eye plane.
    v4 = clip[tri_list]  # (T, 3, 4): (x_w*w, y_w*w, w, z_c)
    w_ok = v4[..., 2] > 1e-6
    yw = v4[..., 1] / jnp.where(w_ok, v4[..., 2], 1.0)
    ymin = jnp.min(jnp.where(w_ok, yw, jnp.inf), axis=1)
    ymax = jnp.max(jnp.where(w_ok, yw, -jnp.inf), axis=1)
    any_bad = ~jnp.all(w_ok, axis=1)
    ymin = jnp.where(any_bad, 0.0, jnp.clip(ymin, 0.0, float(height)))
    ymax = jnp.where(any_bad, float(height), jnp.clip(ymax, 0.0, float(height)))

    # Frustum cull: triangles with all vertices outside one clip plane can
    # never cover a pixel; give them empty y-bounds so the y-sort pushes
    # them into trailing chunks that every pixel tile skips. (Backfaces
    # already have det <= 0 but still occupy chunks; fold them in too.)
    a_, b_, w_, z_ = v4[..., 0], v4[..., 1], v4[..., 2], v4[..., 3]
    out_left = jnp.all(a_ < 0.0, axis=1)  # x_w*w < 0 for all (w>0 region)
    out_right = jnp.all(a_ > w_ * float(width), axis=1)
    out_bottom = jnp.all(b_ < 0.0, axis=1)
    out_top = jnp.all(b_ > w_ * float(height), axis=1)
    out_near = jnp.all(z_ < -w_, axis=1)
    out_far = jnp.all(z_ > w_, axis=1)
    all_behind = jnp.all(v4[..., 2] <= 0.0, axis=1)
    # The plane tests are only sound when every vertex has w > 0.
    all_front = jnp.all(w_ok, axis=1)
    culled = (
        (all_front & (out_left | out_right | out_bottom | out_top | out_near | out_far))
        | all_behind
        | (det <= 0.0)
    )
    ymin = jnp.where(culled, jnp.inf, ymin)
    ymax = jnp.where(culled, -jnp.inf, ymax)
    tri_ybounds = jnp.stack([ymin, ymax], axis=-1)

    return dict(
        e=e,
        det=det,
        vz=vz,
        vs=vs,
        tri_pass=tri_pass,
        transparent=transparent,
        v_tile_uv_tri=tile_uv[tri_list],
        v_atlas_a_tri=atlas_uv_a[tri_list][:, 0],
        v_atlas_b_tri=atlas_uv_b[tri_list][:, 0],
        v_tile_size_tri=tile_size[tri_list][:, 0],
        v_light_tri=light_idx[tri_list][:, 0],
        lights_f=lights_f,
        pvm=pvm,
        tri_ybounds=tri_ybounds,
    )


def _layer_uv(prep, tid, g):
    """Perspective-correct fragment uv for pixel set g (3, p) with winning
    triangles tid (p,)."""
    et = prep["e"][tid]  # (p, 3, 3)
    lam = jnp.einsum("pkc,cp->kp", et, g)
    slam = jnp.sum(lam, axis=0)
    alpha = lam / jnp.where(slam == 0.0, 1.0, slam)[None, :]
    uv = jnp.einsum("kp,pkc->pc", alpha, prep["v_tile_uv_tri"][tid])
    ts = prep["v_tile_size_tri"][tid]
    safe_ts = jnp.where(ts == 0.0, 1.0, ts)
    p_pass = prep["tri_pass"][tid]
    base = jnp.where(
        (p_pass == PASS_WALL)[:, None],
        prep["v_atlas_b_tri"][tid],
        prep["v_atlas_a_tri"][tid],
    )
    uv = jnp.mod(uv, safe_ts) + base
    dett = prep["det"][tid]
    w = dett / jnp.where(slam == 0.0, 1.0, slam)
    return uv, w, p_pass


def _alpha_survives(scene, prep, tid, g, has):
    """Does the layer's texel survive the GL discard test?"""
    transparent_l = prep["transparent"][tid]
    p_pass_l = prep["tri_pass"][tid]
    uv_l, _, _ = _layer_uv(prep, tid, g)
    _, al_wall = _sample_index_alpha(
        scene.walls_atlas_index, scene.walls_atlas_alpha, uv_l[:, 0], uv_l[:, 1]
    )
    _, al_dec = _sample_index_alpha(
        scene.decor_atlas_index, scene.decor_atlas_alpha, uv_l[:, 0], uv_l[:, 1]
    )
    return has & jnp.where(
        transparent_l,
        jnp.where(p_pass_l == PASS_DECOR, al_dec, al_wall),
        True,
    )


def _winner_from_layers(scene, prep, z_layers, id_layers, g):
    """First of the K (z, id) layers whose texel survives -> best_id (p,),
    -1 where uncovered."""
    T = prep["e"].shape[0]
    p = g.shape[1]
    best_id = jnp.full((p,), -1, jnp.int32)
    resolved = jnp.zeros((p,), bool)
    for k in range(z_layers.shape[0]):
        has = jnp.isfinite(z_layers[k]) & (id_layers[k] < T)
        tid = jnp.minimum(jnp.where(has, id_layers[k], 0), T - 1)
        ok = _alpha_survives(scene, prep, tid, g, has)
        win = ok & ~resolved
        best_id = jnp.where(win, tid, best_id)
        resolved = resolved | win | ~has
    return best_id


def _peel_layers_jnp(prep, g, n_layers):
    """Dense all-triangles K-layer peel for one pixel block (the jnp
    backend; the Pallas kernel in tpu_doom.ops reproduces this)."""
    e_p, det_p, vz_p, vs_p = prep["e"], prep["det"], prep["vz"], prep["vs"]
    T = e_p.shape[0]
    inf = jnp.float32(jnp.inf)
    p = g.shape[1]
    prev_z = jnp.full((p,), -jnp.inf)
    prev_id = jnp.full((p,), -1, jnp.int32)
    zs, ids = [], []
    lam0 = e_p[:, 0] @ g
    lam1 = e_p[:, 1] @ g
    lam2 = e_p[:, 2] @ g
    slam = vs_p @ g
    z = (vz_p @ g) / jnp.where(det_p == 0.0, 1.0, det_p)[:, None]
    cover = (
        (det_p > 0.0)[:, None]
        & (lam0 >= 0.0)
        & (lam1 >= 0.0)
        & (lam2 >= 0.0)
        & (slam > 0.0)
        & (z >= -1.0)
        & (z <= 1.0)
    )
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    for _k in range(n_layers):
        after = (z > prev_z) | ((z == prev_z) & (tri_ids[:, None] > prev_id))
        zm = jnp.where(cover & after, z, inf)
        ci = jnp.argmin(zm, axis=0).astype(jnp.int32)
        cz = jnp.take_along_axis(zm, ci[None], axis=0)[0]
        cid = jnp.where(jnp.isfinite(cz), ci, 2**30)
        zs.append(cz)
        ids.append(cid)
        prev_z, prev_id = cz, cid
    return jnp.stack(zs), jnp.stack(ids)


def _shade(scene, cfg, width, height, prep, best_id, grid):
    """Fragment shading for the winning triangles (full frame)."""
    covered = best_id >= 0
    tid = jnp.maximum(best_id, 0)
    uv, w, p_pass = _layer_uv(prep, tid, grid)
    lights_f = prep["lights_f"]

    idx_flat, _ = _sample_index_alpha(scene.flats_atlas, None, uv[:, 0], uv[:, 1])
    idx_wall, _ = _sample_index_alpha(
        scene.walls_atlas_index, scene.walls_atlas_alpha, uv[:, 0], uv[:, 1]
    )
    idx_dec, _ = _sample_index_alpha(
        scene.decor_atlas_index, scene.decor_atlas_alpha, uv[:, 0], uv[:, 1]
    )
    texel = jnp.where(
        p_pass == PASS_FLAT,
        idx_flat,
        jnp.where(p_pass == PASS_WALL, idx_wall, idx_dec),
    ).astype(jnp.int32)

    v_light = lights_f[jnp.clip(prep["v_light_tri"][tid], 0, lights_f.shape[0] - 1)]
    dist_term_s = jnp.minimum(1.0, 1.0 - DIST_SCALE_STATIC / (w + DIST_SCALE_STATIC))
    dist_term_d = jnp.minimum(1.0, 1.0 - DIST_SCALE_SPRITE / (w + DIST_SCALE_SPRITE))
    light_static = v_light * LIGHT_SCALE - dist_term_s
    light_decor = jnp.minimum(v_light, v_light * LIGHT_SCALE - dist_term_d)
    light = jnp.where(p_pass == PASS_DECOR, light_decor, light_static)
    # Palette LUT row: clamp + nearest on the 32-row texture (static.frag:25).
    n_rows = scene.palette_lut.shape[0]
    row = jnp.clip(jnp.floor((1.0 - light) * n_rows).astype(jnp.int32), 0, n_rows - 1)
    index_static = scene.colormaps[row, texel]

    # Sky (sky.vert/sky.frag): pure function of pixel ndc + view direction.
    pvm = prep["pvm"]
    fwd = pvm[:, 2]
    v_r = jnp.stack(
        [jnp.arctan2(fwd[0], fwd[2]), fwd[1] / jnp.where(fwd[3] == 0.0, 1.0, fwd[3])]
    )
    ndc_x = grid[0] / (0.5 * width) - 1.0
    ndc_y = grid[1] / (0.5 * height) - 1.0
    sky_u = ndc_x - 4.0 * v_r[0] / jnp.float32(math.pi)
    sky_v = -ndc_y + 1.0 + v_r[1]
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
    sh, sw = scene.sky_index.shape
    sx = jnp.mod(jnp.floor(sky_u * sw).astype(jnp.int32), sw)
    sy = jnp.mod(jnp.floor(sky_v * sh).astype(jnp.int32), sh)
    sky_texel = scene.sky_index[sy, sx].astype(jnp.int32)
    index_sky = scene.colormaps[0, sky_texel]

    index = jnp.where(p_pass == PASS_SKY, index_sky, index_static)
    index = jnp.where(covered, index, 0).astype(jnp.uint8)
    return index, covered


def _shade_from_channels(scene, cfg, width, height, ch, lights_f, pvm, grid,
                         z_limit=None):
    """Fragment shading from the fused kernel's resolved channels
    (tpu_doom.ops.raster_pallas docstring). ch: (K, 16, P). The combined
    colormapped atlas folds texel fetch + transparency + colormap LUT into
    ONE take per depth layer (sky rides along as plane 3, colormap row 0).

    z_limit: optional (P,) NDC depth; fragments at or beyond it are
    discarded (the portal backend's masked/sprite merge: GL depth test
    against the opaque portal surface)."""
    del lights_f  # light VALUES were resolved in-kernel (attr col 6)
    K = ch.shape[0]
    n_rows, _, hc, wc = scene.combo_atlas.shape
    combo_flat = scene.combo_atlas.reshape(-1)
    dims = scene.combo_dims  # (4, 2) i32

    # Sky texel coordinates (sky.vert/sky.frag), computed once per pixel.
    fwd = pvm[:, 2]
    v_r = jnp.stack(
        [jnp.arctan2(fwd[0], fwd[2]), fwd[1] / jnp.where(fwd[3] == 0.0, 1.0, fwd[3])]
    )
    ndc_x = grid[0] / (0.5 * width) - 1.0
    ndc_y = grid[1] / (0.5 * height) - 1.0
    sky_u = ndc_x - 4.0 * v_r[0] / jnp.float32(math.pi)
    sky_v = -ndc_y + 1.0 + v_r[1]
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
    sky_x = jnp.mod(jnp.floor(sky_u * dims[3, 1]).astype(jnp.int32), dims[3, 1])
    sky_y = jnp.mod(jnp.floor(sky_v * dims[3, 0]).astype(jnp.int32), dims[3, 0])

    p = grid.shape[1]
    covered = jnp.zeros((p,), bool)
    out_index = jnp.zeros((p,), jnp.int32)
    done = jnp.zeros((p,), bool)
    for k in range(K):
        uvx, uvy, w = ch[k, 1], ch[k, 2], ch[k, 3]
        tsx, tsy = ch[k, 4], ch[k, 5]
        bax, bay, bbx, bby = ch[k, 6], ch[k, 7], ch[k, 8], ch[k, 9]
        light_v = ch[k, 10]
        p_pass = ch[k, 11].astype(jnp.int32)
        transp = ch[k, 12] > 0.5
        has = ch[k, 13] > 0.5
        if z_limit is not None:
            has = has & (ch[k, 0] < z_limit)
        is_wall = p_pass == PASS_WALL
        is_sky = p_pass == PASS_SKY
        u = jnp.mod(uvx, jnp.where(tsx == 0.0, 1.0, tsx)) + jnp.where(is_wall, bbx, bax)
        v = jnp.mod(uvy, jnp.where(tsy == 0.0, 1.0, tsy)) + jnp.where(is_wall, bby, bay)
        plane = jnp.clip(p_pass, 0, 3)
        wrap_h = dims[0, 0] * (p_pass == PASS_FLAT) + dims[1, 0] * is_wall + dims[
            2, 0
        ] * (p_pass == PASS_DECOR) + dims[3, 0] * is_sky
        wrap_w = dims[0, 1] * (p_pass == PASS_FLAT) + dims[1, 1] * is_wall + dims[
            2, 1
        ] * (p_pass == PASS_DECOR) + dims[3, 1] * is_sky
        x = jnp.mod(jnp.floor(u).astype(jnp.int32), jnp.maximum(wrap_w, 1))
        y = jnp.mod(jnp.floor(v).astype(jnp.int32), jnp.maximum(wrap_h, 1))
        x = jnp.where(is_sky, sky_x, x)
        y = jnp.where(is_sky, sky_y, y)

        # Colormap row from light + distance (static.frag:24-26 /
        # sprite.frag:24-26); sky uses row 0 (sky.frag:24).
        dist_term_s = jnp.minimum(
            1.0, 1.0 - DIST_SCALE_STATIC / (w + DIST_SCALE_STATIC)
        )
        dist_term_d = jnp.minimum(
            1.0, 1.0 - DIST_SCALE_SPRITE / (w + DIST_SCALE_SPRITE)
        )
        light_static = light_v * LIGHT_SCALE - dist_term_s
        light_decor = jnp.minimum(light_v, light_v * LIGHT_SCALE - dist_term_d)
        light = jnp.where(p_pass == PASS_DECOR, light_decor, light_static)
        row = jnp.clip(
            jnp.floor((1.0 - light) * n_rows).astype(jnp.int32), 0, n_rows - 1
        )
        row = jnp.where(is_sky, 0, row)

        lin = ((row * 4 + plane) * hc + y) * wc + x
        value = jnp.take(combo_flat, lin)
        index = (value & 255).astype(jnp.int32)  # combo_atlas is u16
        hole = value >= 256
        survive = has & jnp.where(transp, ~hole, True)
        win = survive & ~done
        covered = covered | win
        out_index = jnp.where(win, index, out_index)
        done = done | win | ~has

    index = jnp.where(covered, out_index, 0).astype(jnp.uint8)
    return index, covered


def _resolve_backend(cfg: GameConfig) -> str:
    if cfg.raster_backend != "auto":
        return cfg.raster_backend
    platform = jax.devices()[0].platform
    return "pallas" if platform in ("tpu", "axon") else "jnp"


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_frames(scene, cfg: GameConfig, state, width: int, height: int):
    """Render all envs -> (indices (B, H, W) u8, covered (B, H, W) bool)."""
    # HIGHEST keeps every small-K contraction here (vertex transforms,
    # barycentric evaluations) exact f32: the default matmul precision
    # truncates f32 operands to bf16 -- whether a K=3 dot stays exact
    # would otherwise depend on XLA's strength-reduction heuristics.
    # The Pallas peel kernel computes the same quantities with explicit
    # FMAs, so exactness here is what keeps the backends bit-identical.
    with jax.default_matmul_precision("highest"):
        return _render_frames_inner(scene, cfg, state, width, height)


def _render_frames_inner(scene, cfg: GameConfig, state, width: int, height: int):
    backend = _resolve_backend(cfg)
    batch = state.pos.shape[0]
    tri_list, _, _ = _scene_triangles(scene)
    ntris = tri_list.shape[0]
    npix = width * height
    n_layers = max(int(cfg.depth_layers), 1)
    grid = _pixel_grid(width, height)

    prep = jax.vmap(
        lambda pos, yaw, pitch, off, t: _prepare_env(
            scene, cfg, width, height, pos, yaw, pitch, off, t
        )
    )(state.pos, state.yaw, state.pitch, state.object_offset, state.time)

    if backend in ("pallas", "pallas_interpret"):
        from ..ops.raster_pallas import (
            pack_triangle_attrs,
            pack_triangle_rows_full,
            peel_resolve_pallas,
        )

        rows = pack_triangle_rows_full(
            prep["e"], prep["det"], prep["vz"], prep["vs"], prep["v_tile_uv_tri"]
        )
        # Per-triangle light VALUE (tiny T-sized gather, per env).
        light_val = jnp.take_along_axis(
            prep["lights_f"],
            jnp.clip(prep["v_light_tri"], 0, prep["lights_f"].shape[-1] - 1),
            axis=-1,
        )
        attrs = pack_triangle_attrs(
            prep["v_tile_size_tri"],
            prep["v_atlas_a_tri"],
            prep["v_atlas_b_tri"],
            light_val,
            prep["tri_pass"],
            prep["transparent"],
            prep["det"],
        )
        # Sort triangles by screen ymin so the kernel's per-chunk y-bounds
        # are tight (original draw-order ids ride in rows col 22).
        ybounds = prep["tri_ybounds"]
        order = jnp.argsort(ybounds[..., 0], axis=-1)
        rows = jnp.take_along_axis(rows, order[..., None], axis=1)
        attrs = jnp.take_along_axis(attrs, order[..., None], axis=1)
        ybounds = jnp.take_along_axis(ybounds, order[..., None], axis=1)
        channels = peel_resolve_pallas(
            rows, attrs, grid, ybounds, n_layers,
            tile_p=cfg.raster_tile_p,
            chunk_t=cfg.raster_chunk_t,
            interpret=(backend == "pallas_interpret"),
        )

        idx, cov = jax.vmap(
            lambda ch, lf, pvm: _shade_from_channels(
                scene, cfg, width, height, ch, lf, pvm, grid
            )
        )(channels, prep["lights_f"], prep["pvm"])
    else:
        # Pixel blocking keeps the dense (T, block) intermediates bounded;
        # the unrolled python loop lets XLA reuse the buffers sequentially.
        budget_total = 120_000_000
        blk = max(512, min(npix, budget_total // max(batch * ntris, 1)))
        nblocks = -(-npix // blk)
        pad_px = nblocks * blk - npix
        grid_p = jnp.pad(grid, ((0, 0), (0, pad_px)))

        def peel_and_pick(prep_e):
            ids = []
            for b in range(nblocks):
                g = grid_p[:, b * blk : (b + 1) * blk]
                z_l, id_l = _peel_layers_jnp(prep_e, g, n_layers)
                ids.append(_winner_from_layers(scene, prep_e, z_l, id_l, g))
            return jnp.concatenate(ids)[:npix]

        best_id = jax.vmap(peel_and_pick)(prep)
        idx, cov = jax.vmap(
            lambda prep_e, bid: _shade(scene, cfg, width, height, prep_e, bid, grid)
        )(prep, best_id)

    return (
        idx.reshape(batch, height, width),
        cov.reshape(batch, height, width),
    )


def frames_to_rgb(palette, indices, covered=None):
    """Map palette-index frames to RGB u8 via PLAYPAL palette 0.
    Background (uncovered) pixels get the GL clear color
    (engine/src/window.rs:40-44: (0.06, 0.07, 0.09))."""
    rgb = jnp.asarray(palette)[indices]
    if covered is not None:
        clear = jnp.array(
            [int(0.06 * 255), int(0.07 * 255), int(0.09 * 255)], dtype=jnp.uint8
        )
        rgb = jnp.where(covered[..., None], rgb, clear)
    return rgb
