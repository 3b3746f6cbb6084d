"""Pure-jnp software rasterizer: the correctness-reference render path.

Replaces the reference's GL pipeline (engine/src/renderer.rs + GLSL in
assets/shaders) with 2D-homogeneous triangle rasterization:

  * vertex processing reproduces static.vert / sky.vert / sprite.vert:
    animation frame select with atlas row wrap, scroll, billboarding,
    per-vertex light fetch;
  * coverage/depth uses homogeneous barycentrics (no explicit clipping:
    per-pixel w > 0 and z_ndc in [-1, 1] reproduce GL clip+depth-test);
  * fragments reproduce static.frag / sprite.frag / sky.frag: atlas cell
    wrap `mod(tile_uv, tile_size) + atlas_uv`, transparency discard,
    distance term + light -> colormap row, palette LUT;
  * depth resolve: opaque triangles in one chunked min-reduce pass,
    transparent-capable triangles (masked walls, sprites) in a per-triangle
    pass with alpha-aware coverage (GL `discard` writes no depth).

Output is Doom-authentic: (H, W) uint8 palette indices with the colormap
applied, plus a coverage mask; `frames_to_rgb` maps through PLAYPAL.

Structure note for the TPU: the coverage loop is (triangle-rows x pixels)
matmul-shaped; tpu_doom.ops provides the Pallas fused version, this module
is the semantics reference and the CPU/testing path.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.config import GameConfig
from .camera import camera_matrices
from ..sim.lights import light_table_u8

PASS_FLAT, PASS_WALL, PASS_DECOR, PASS_SKY = 0, 1, 2, 3
ANIM_FPS = 8.0 / 35.0  # assets/shaders/static.vert:22
DIST_SCALE_STATIC = 0.9  # static.frag:17
DIST_SCALE_SPRITE = 1.0  # sprite.frag:17
LIGHT_SCALE = 2.0

_OPAQUE_CHUNK = 16


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
    """Homogeneous rasterization setup. clip: (N, 4); tris: (T, 3) ->
    per-tri edge rows e (T, 3, 3), det (T,), z row vz (T, 3), sum row
    vs (T, 3). Pixel-space scaling folded in by the caller (clip is
    already viewport-scaled homogeneous: (x_w*w, y_w*w, w, z_c))."""
    v = clip[tris]  # (T, 3, 4)
    c = v[..., :3]  # columns (a, b, w) per vertex
    c0, c1, c2 = c[:, 0], c[:, 1], c[:, 2]
    e0 = jnp.cross(c1, c2)
    e1 = jnp.cross(c2, c0)
    e2 = jnp.cross(c0, c1)
    det = jnp.sum(c0 * e0, axis=-1)
    z = v[..., 3]  # (T, 3) clip z
    vz = z[:, 0, None] * e0 + z[:, 1, None] * e1 + z[:, 2, None] * e2
    vs = e0 + e1 + e2
    e = jnp.stack([e0, e1, e2], axis=1)  # (T, 3, 3)
    return e, det, vz, vs


def _viewport_homogeneous(clip4, width, height):
    """clip (N,4) -> (N,4) homogeneous window coords + clip z:
    (x_w * w, y_w * w, w, z_clip) with window origin bottom-left."""
    x, y, z, w = clip4[:, 0], clip4[:, 1], clip4[:, 2], clip4[:, 3]
    a = (x + w) * 0.5 * width
    b = (y + w) * 0.5 * height
    return jnp.stack([a, b, w, z], axis=-1)


def _pixel_grid(width, height):
    """(3, P) pixel-center homogeneous coords; row j of the image is window
    y = height - j - 0.5 (GL origin bottom-left)."""
    i = jnp.arange(width, dtype=jnp.float32) + 0.5
    j = jnp.arange(height, dtype=jnp.float32)
    py = height - j - 0.5
    px = jnp.tile(i, height)
    pyf = jnp.repeat(py, width)
    ones = jnp.ones_like(px)
    return jnp.stack([px, pyf, ones], axis=0)


def _render_env(
    scene,
    cfg: GameConfig,
    width: int,
    height: int,
    pos,
    yaw,
    pitch,
    object_offset,
    time,
):
    """Render one env -> (index (H*W,) u8, covered (H*W,) bool)."""
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
    light_u8 = light_table_u8(scene, time)  # (L,) u8
    lights_f = light_u8.astype(jnp.float32) / 255.0

    flats_w = float(scene.flats_atlas.shape[1])
    walls_w = float(scene.walls_atlas_index.shape[1])

    # --- vertex processing -------------------------------------------------
    # Static stream: object y offsets, clip transform, scroll, animation.
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

    # Sky stream.
    k_pos = scene.sky_pos.at[:, 1].add(object_offset[scene.sky_object])
    k_clip = k_pos @ pvm[:, :3].T + pvm[:, 3]

    # Decor stream: billboard along the camera-right vector
    # (sprite.vert:40-41: right = row 0 of modelview).
    right = mv[0, :3]
    d_pos = scene.decor_pos.at[:, 1].add(object_offset[scene.decor_object])
    d_pos = d_pos + right[None, :] * scene.decor_local_x[:, None]
    d_clip = d_pos @ pvm[:, :3].T + pvm[:, 3]

    # --- combined vertex/triangle tables -----------------------------------
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

    e, det, vz, vs = _setup_triangles(clip, tri_list)
    # Backface cull (clockwise in window coords culled, renderer.rs:49-57):
    # det > 0 keeps counter-clockwise front faces.
    det = jnp.where(det > 0.0, det, 0.0)

    grid = _pixel_grid(width, height)  # (3, P)
    npix = width * height

    # --- opaque depth pass -----------------------------------------------------
    T = tri_list.shape[0]
    pad = (-T) % _OPAQUE_CHUNK
    padded = T + pad

    def padcat(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    e_p = padcat(e, 0.0)
    det_p = padcat(det, 0.0)
    vz_p = padcat(vz, 0.0)
    vs_p = padcat(vs, 0.0)
    opaque_p = padcat(~transparent, False)
    trans_p = padcat(transparent, False)

    inf = jnp.float32(jnp.inf)

    def coverage_z(e_c, det_c, vz_c, vs_c, active):
        """(C,...) triangle chunk -> (C, P) coverage and z."""
        lam0 = e_c[:, 0] @ grid
        lam1 = e_c[:, 1] @ grid
        lam2 = e_c[:, 2] @ grid
        slam = vs_c @ grid
        front = (det_c > 0.0) & active
        cover = (
            front[:, None]
            & (lam0 >= 0.0)
            & (lam1 >= 0.0)
            & (lam2 >= 0.0)
            & (slam > 0.0)
        )
        z = (vz_c @ grid) / jnp.where(det_c == 0.0, 1.0, det_c)[:, None]
        cover = cover & (z >= -1.0) & (z <= 1.0)
        return cover, z

    def opaque_body(carry, idx):
        best_z, best_id = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * _OPAQUE_CHUNK, _OPAQUE_CHUNK)
        cover, z = coverage_z(sl(e_p), sl(det_p), sl(vz_p), sl(vs_p), sl(opaque_p))
        zm = jnp.where(cover, z, inf)
        ci = jnp.argmin(zm, axis=0)  # (P,)
        cz = jnp.take_along_axis(zm, ci[None], axis=0)[0]
        better = cz < best_z
        best_z = jnp.where(better, cz, best_z)
        best_id = jnp.where(better, idx * _OPAQUE_CHUNK + ci, best_id)
        return (best_z, best_id), None

    init = (jnp.full((npix,), inf), jnp.full((npix,), -1, jnp.int32))
    (best_z, best_id), _ = jax.lax.scan(
        opaque_body, init, jnp.arange(padded // _OPAQUE_CHUNK)
    )

    # --- transparent depth pass (alpha-aware coverage) ------------------------
    # Process transparent triangles one by one in draw order; GL discard
    # means transparent texels neither write depth nor color.
    trans_ids = jnp.nonzero(trans_p, size=padded, fill_value=-1)[0]
    n_trans = jnp.sum(trans_p.astype(jnp.int32))

    v_tile_uv_tri = tile_uv[tri_list]  # (T, 3, 2)
    v_atlas_a_tri = atlas_uv_a[tri_list][:, 0]  # provoking/flat: (T, 2)
    v_atlas_b_tri = atlas_uv_b[tri_list][:, 0]
    v_tile_size_tri = tile_size[tri_list][:, 0]
    v_light_tri = light_idx[tri_list][:, 0]

    def frag_uv(t, lam, slam):
        """Perspective-correct uv for triangle t at all pixels."""
        alpha = lam / jnp.where(slam == 0.0, 1.0, slam)[None, :]  # (3, P)
        uv = jnp.einsum("kp,kc->pc", alpha, v_tile_uv_tri[t])  # (P, 2)
        ts = v_tile_size_tri[t]
        safe_ts = jnp.where(ts == 0.0, 1.0, ts)
        base = jnp.where(
            tri_pass[t] == PASS_WALL, v_atlas_b_tri[t], v_atlas_a_tri[t]
        )
        return jnp.mod(uv, safe_ts) + base

    def trans_body(carry, i):
        best_z, best_id = carry
        t = trans_ids[i]
        valid = t >= 0
        tt = jnp.maximum(t, 0)
        et, dett, vzt, vst = e_p[tt], det_p[tt], vz_p[tt], vs_p[tt]
        lam = et @ grid  # (3, P)
        slam = vst @ grid
        cover = (
            valid
            & (dett > 0.0)
            & jnp.all(lam >= 0.0, axis=0)
            & (slam > 0.0)
        )
        z = (vzt @ grid) / jnp.where(dett == 0.0, 1.0, dett)
        cover = cover & (z >= -1.0) & (z <= 1.0)
        uv = frag_uv(tt, lam, slam)
        _, al_wall = _sample_index_alpha(
            scene.walls_atlas_index, scene.walls_atlas_alpha, uv[:, 0], uv[:, 1]
        )
        _, al_dec = _sample_index_alpha(
            scene.decor_atlas_index, scene.decor_atlas_alpha, uv[:, 0], uv[:, 1]
        )
        alpha_ok = jnp.where(tri_pass[tt] == PASS_DECOR, al_dec, al_wall)
        cover = cover & alpha_ok
        better = cover & (z < best_z)
        best_z = jnp.where(better, z, best_z)
        best_id = jnp.where(better, tt, best_id)
        return (best_z, best_id), None

    (best_z, best_id), _ = jax.lax.scan(
        trans_body, (best_z, best_id), jnp.arange(padded)
    )
    del n_trans

    # --- shading -----------------------------------------------------------------
    covered = best_id >= 0
    tid = jnp.maximum(best_id, 0)

    et = e_p[tid]  # (P, 3, 3)
    lam = jnp.einsum("pkc,cp->kp", et, grid)  # (3, P)
    slam = jnp.sum(lam, axis=0)
    dett = det_p[tid]
    w = dett / jnp.where(slam == 0.0, 1.0, slam)  # view w = distance term

    alpha = lam / jnp.where(slam == 0.0, 1.0, slam)[None, :]
    uv_int = jnp.einsum("kp,pkc->pc", alpha, v_tile_uv_tri[tid])
    ts = v_tile_size_tri[tid]
    safe_ts = jnp.where(ts == 0.0, 1.0, ts)
    p_pass = tri_pass[tid]
    base = jnp.where(
        (p_pass == PASS_WALL)[:, None], v_atlas_b_tri[tid], v_atlas_a_tri[tid]
    )
    uv = jnp.mod(uv_int, safe_ts) + base

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

    v_light = lights_f[jnp.clip(v_light_tri[tid], 0, lights_f.shape[0] - 1)]
    dist_term_s = jnp.minimum(
        1.0, 1.0 - DIST_SCALE_STATIC / (w + DIST_SCALE_STATIC)
    )
    dist_term_d = jnp.minimum(
        1.0, 1.0 - DIST_SCALE_SPRITE / (w + DIST_SCALE_SPRITE)
    )
    light_static = v_light * LIGHT_SCALE - dist_term_s
    light_decor = jnp.minimum(v_light, v_light * LIGHT_SCALE - dist_term_d)
    light = jnp.where(p_pass == PASS_DECOR, light_decor, light_static)
    # Palette LUT row: clamp + nearest on a 32-row texture (static.frag:25).
    n_rows = scene.palette_lut.shape[0]
    row = jnp.clip(
        jnp.floor((1.0 - light) * n_rows).astype(jnp.int32), 0, n_rows - 1
    )
    index_static = scene.colormaps[row, texel]

    # --- sky (sky.vert/sky.frag) -------------------------------------------------
    fwd = pvm[:, 2]  # column 2 of projection * modelview
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


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_frames(scene, cfg: GameConfig, state, width: int, height: int):
    """Render all envs -> (indices (B, H, W) u8, covered (B, H, W) bool)."""
    def one(pos, yaw, pitch, off, time):
        idx, cov = _render_env(
            scene, cfg, width, height, pos, yaw, pitch, off, time
        )
        return idx.reshape(height, width), cov.reshape(height, width)

    return jax.vmap(one)(
        state.pos, state.yaw, state.pitch, state.object_offset, state.time
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
