"""Pallas TPU kernels for the software rasterizer.

Four kernels:

* `classify_alpha_pallas` -- the portal renderer's first-match span
  classifier with the masked-family texel alpha test fused in
  (see render/portal.py for the record format).

* `shade_portal_pallas` -- the portal renderer's fragment shader:
  per-pixel texel + colormap + transparency resolve as two
  `_mxu_lookup` stages over the COMPACT texel table (one-hot segment
  matmuls with pixels kept on lanes -- no gather instruction, no
  relayout; measured ~5x faster than XLA's dense gather).

* `depth_peel_pallas` -- K-layer (z, draw-order id) depth peel. Each
  program owns a pixel tile in VMEM and streams triangle chunks (the
  flash-attention pattern, no HBM intermediates), with the same
  lexicographic tie rules as the reference GL depth test.

* `peel_resolve_pallas` -- the fused production kernel: peel + per-pixel
  attribute RESOLVE. After each layer's peel, the winner's interpolation
  coefficients and flat attributes are recovered with chunked
  one-hot-mask MXU matmuls (rows^T @ (ids == best)) instead of per-pixel
  gathers -- XLA gathers lower to scalar loops on TPU and were the
  dominant render cost. Per-triangle scalars ride along as extra matmul
  columns; interpolated quantities use coefficient rows (any linear-in-
  screen-space quantity q satisfies q*slam = row . pixel).

Row packing (pack_triangle_rows_full): per-triangle f32 coefficients
  [0:9)   e rows (homogeneous edge functions)
  [9:12)  zr = vz/det  (z_ndc = zr . p)
  [12:15) vs           (slam = vs . p ; barycentric sum)
  [15]    valid        (backface/degenerate cull folded in)
  [16:19) uxr          (tile_u * slam = uxr . p)
  [19:22) uyr
  [22]    original draw-order id (f32; triangles may be y-sorted for
          chunk culling, ties and resolve masks use this column)
  [23]    zero padding
Attr packing (pack_triangle_attrs): per-triangle f32 scalars
  [tsx, tsy, base_a_x, base_a_y, base_b_x, base_b_y, light_value,
   pass_id, transparent, det, 0...]  (16 cols)

Output channels of peel_resolve (B, K, 16, P):
  0 z | 1 uvx | 2 uvy | 3 w | 4 tsx | 5 tsy | 6 bax | 7 bay | 8 bbx |
  9 bby | 10 light | 11 pass | 12 transparent | 13 has | 14-15 zero
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
INF = float("inf")
BIG_ID = 2**30
# Fused-kernel classify: unroll the per-record loop up to this many
# records; above it, roll over crossings (see _render_fused_kernel).
ROLL_CLASSIFY_ABOVE = 64

ROWS_COLS = 24
ATTR_COLS = 16
OUT_CHANNELS = 16


def pack_triangle_rows(e, det, vz, vs):
    """(..., T, 3, 3), (..., T), (..., T, 3), (..., T, 3) ->
    (..., T, 16) f32 coefficient rows [e00..e22, zr, vs, valid]
    (the peel-only kernel's input)."""
    safe_det = jnp.where(det == 0.0, 1.0, det)
    zr = vz / safe_det[..., None]
    valid = (det > 0.0).astype(jnp.float32)
    flat_e = e.reshape(*e.shape[:-2], 9)
    return jnp.concatenate([flat_e, zr, vs, valid[..., None]], axis=-1)


def pack_triangle_rows_full(e, det, vz, vs, tri_uv):
    """Adds the tile-uv interpolation rows; tri_uv is (..., T, 3, 2)
    per-vertex tile uv. Returns (..., T, 24)."""
    base = pack_triangle_rows(e, det, vz, vs)
    # q*slam rows: uxr = sum_i uv_i_x * e_i.
    uxr = jnp.einsum("...tk,...tkc->...tc", tri_uv[..., 0], e)
    uyr = jnp.einsum("...tk,...tkc->...tc", tri_uv[..., 1], e)
    t = base.shape[-2]
    orig_id = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.float32), base.shape[:-1]
    )[..., None]
    zeros = jnp.zeros(base.shape[:-1] + (1,), base.dtype)
    return jnp.concatenate([base, uxr, uyr, orig_id, zeros], axis=-1)


def pack_triangle_attrs(
    tile_size, base_a, base_b, light_value, pass_id, transparent, det
):
    """Per-triangle flat scalars -> (..., T, 16) f32."""
    cols = [
        tile_size[..., 0],
        tile_size[..., 1],
        base_a[..., 0],
        base_a[..., 1],
        base_b[..., 0],
        base_b[..., 1],
        light_value,
        pass_id.astype(jnp.float32),
        transparent.astype(jnp.float32),
        det,
    ]
    out = jnp.stack(cols, axis=-1)
    pad = ATTR_COLS - out.shape[-1]
    return jnp.concatenate(
        [out, jnp.zeros(out.shape[:-1] + (pad,), out.dtype)], axis=-1
    )


def _peel_chunk(sub, px, py, prev_z, prev_id, best_z, best_id, base_id, chunk_t, tile_p):
    """One triangle chunk of one peel sweep. sub: (chunk_t, 16+) rows."""
    lam0 = sub[:, 0:1] * px + sub[:, 1:2] * py + sub[:, 2:3]
    lam1 = sub[:, 3:4] * px + sub[:, 4:5] * py + sub[:, 5:6]
    lam2 = sub[:, 6:7] * px + sub[:, 7:8] * py + sub[:, 8:9]
    z = sub[:, 9:10] * px + sub[:, 10:11] * py + sub[:, 11:12]
    slam = sub[:, 12:13] * px + sub[:, 13:14] * py + sub[:, 14:15]
    valid = sub[:, 15:16] > 0.0
    cover = (
        valid
        & (lam0 >= 0.0)
        & (lam1 >= 0.0)
        & (lam2 >= 0.0)
        & (slam > 0.0)
        & (z >= -1.0)
        & (z <= 1.0)
    )
    ids = base_id + jax.lax.broadcasted_iota(jnp.int32, (chunk_t, tile_p), 0)
    after = (z > prev_z) | ((z == prev_z) & (ids > prev_id))
    zm = jnp.where(cover & after, z, INF)
    ci = jnp.argmin(zm, axis=0)[None, :]
    cz = jnp.min(zm, axis=0)[None, :]
    cid = base_id + ci
    better = (cz < best_z) | ((cz == best_z) & (cid < best_id) & (cz < INF))
    return jnp.where(better, cz, best_z), jnp.where(better, cid, best_id)


def _peel_kernel(tri_ref, grid_ref, z_ref, id_ref, *, n_layers, chunk_t, tile_p):
    t_padded = tri_ref.shape[1]
    n_chunks = t_padded // chunk_t
    px = grid_ref[0:1, :]
    py = grid_ref[1:2, :]
    prev_z = jnp.full((1, tile_p), NEG_INF, jnp.float32)
    prev_id = jnp.full((1, tile_p), -1, jnp.int32)
    for layer in range(n_layers):
        best_z = jnp.full((1, tile_p), INF, jnp.float32)
        best_id = jnp.full((1, tile_p), BIG_ID, jnp.int32)
        for c in range(n_chunks):
            sub = tri_ref[0, pl.ds(c * chunk_t, chunk_t), :]
            best_z, best_id = _peel_chunk(
                sub, px, py, prev_z, prev_id, best_z, best_id,
                c * chunk_t, chunk_t, tile_p,
            )
        z_ref[0, layer, :] = best_z[0]
        id_ref[0, layer, :] = best_id[0]
        prev_z, prev_id = best_z, best_id


@functools.partial(
    jax.jit, static_argnames=("n_layers", "tile_p", "chunk_t", "interpret")
)
def depth_peel_pallas(
    tri_rows,  # (B, T, 16)
    grid,  # (3, P)
    n_layers: int,
    tile_p: int = 512,
    chunk_t: int = 128,
    interpret: bool = False,
):
    """(z (B, K, P) f32, id (B, K, P) i32); id == BIG_ID where empty."""
    b, t, _ = tri_rows.shape
    p = grid.shape[1]
    pad_t = (-t) % chunk_t
    if pad_t:
        tri_rows = jnp.pad(tri_rows, ((0, 0), (0, pad_t), (0, 0)))
    pad_p = (-p) % tile_p
    if pad_p:
        grid = jnp.pad(grid, ((0, 0), (0, pad_p)))
    t_padded, p_padded = t + pad_t, p + pad_p

    kernel = functools.partial(
        _peel_kernel, n_layers=n_layers, chunk_t=chunk_t, tile_p=tile_p
    )
    z, ids = pl.pallas_call(
        kernel,
        grid=(b, p_padded // tile_p),
        in_specs=[
            pl.BlockSpec((1, t_padded, 16), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_p), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_layers, tile_p), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_layers, tile_p), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_layers, p_padded), jnp.float32),
            jax.ShapeDtypeStruct((b, n_layers, p_padded), jnp.int32),
        ],
        interpret=interpret,
    )(tri_rows, grid)
    return z[..., :p], ids[..., :p]


def _peel_chunk_f32id(sub, px, py, prev_z, prev_id, best_z, best_id, tile_p):
    """One chunk of one peel sweep with draw-order ids from rows col 22
    (f32, exact for ids < 2^24). Lexicographic (z, id) merge is
    commutative, so chunk processing order (e.g. y-sorted) is free."""
    lam0 = sub[:, 0:1] * px + sub[:, 1:2] * py + sub[:, 2:3]
    lam1 = sub[:, 3:4] * px + sub[:, 4:5] * py + sub[:, 5:6]
    lam2 = sub[:, 6:7] * px + sub[:, 7:8] * py + sub[:, 8:9]
    z = sub[:, 9:10] * px + sub[:, 10:11] * py + sub[:, 11:12]
    slam = sub[:, 12:13] * px + sub[:, 13:14] * py + sub[:, 14:15]
    valid = sub[:, 15:16] > 0.0
    cover = (
        valid
        & (lam0 >= 0.0)
        & (lam1 >= 0.0)
        & (lam2 >= 0.0)
        & (slam > 0.0)
        & (z >= -1.0)
        & (z <= 1.0)
    )
    ids = jnp.broadcast_to(sub[:, 22:23], (sub.shape[0], tile_p))
    after = (z > prev_z) | ((z == prev_z) & (ids > prev_id))
    ok = cover & after
    zm = jnp.where(ok, z, INF)
    cz = jnp.min(zm, axis=0)[None, :]
    # Among equal-z candidates pick the smallest draw-order id.
    cid = jnp.min(jnp.where(ok & (z == cz), ids, jnp.float32(BIG_ID)), axis=0)[None, :]
    better = (cz < best_z) | ((cz == best_z) & (cid < best_id) & (cz < INF))
    return jnp.where(better, cz, best_z), jnp.where(better, cid, best_id)


def _peel_resolve_kernel(
    tri_ref, attr_ref, grid_ref, bounds_ref, out_ref, *, n_layers, chunk_t, tile_p
):
    t_padded = tri_ref.shape[1]
    n_chunks = t_padded // chunk_t
    px = grid_ref[0:1, :]
    py = grid_ref[1:2, :]
    # This tile's window-y extent, for sorted-chunk culling.
    py_min = jnp.min(py) - 1.0
    py_max = jnp.max(py) + 1.0

    prev_z = jnp.full((1, tile_p), NEG_INF, jnp.float32)
    prev_id = jnp.full((1, tile_p), jnp.float32(-1.0))
    for layer in range(n_layers):
        best_z = jnp.full((1, tile_p), INF, jnp.float32)
        best_id = jnp.full((1, tile_p), jnp.float32(BIG_ID))
        for c in range(n_chunks):
            overlap = (bounds_ref[0, c, 0] <= py_max) & (
                bounds_ref[0, c, 1] >= py_min
            )

            def do_chunk(best_z=best_z, best_id=best_id, c=c):
                sub = tri_ref[0, pl.ds(c * chunk_t, chunk_t), :]
                return _peel_chunk_f32id(
                    sub, px, py, prev_z, prev_id, best_z, best_id, tile_p
                )

            best_z, best_id = jax.lax.cond(
                overlap, do_chunk, lambda best_z=best_z, best_id=best_id: (best_z, best_id)
            )

        # Resolve: one-hot winner mask per chunk, rows^T @ mask on the MXU.
        acc = jnp.zeros((ROWS_COLS + ATTR_COLS, tile_p), jnp.float32)
        for c in range(n_chunks):
            overlap = (bounds_ref[0, c, 0] <= py_max) & (
                bounds_ref[0, c, 1] >= py_min
            )

            def do_resolve(acc=acc, c=c):
                rows = tri_ref[0, pl.ds(c * chunk_t, chunk_t), :]  # (CT, 24)
                ids = jnp.broadcast_to(rows[:, 22:23], (chunk_t, tile_p))
                mask = (ids == best_id).astype(jnp.float32)
                attrs = attr_ref[0, pl.ds(c * chunk_t, chunk_t), :]  # (CT, 16)
                packed = jnp.concatenate([rows, attrs], axis=1)  # (CT, 40)
                return acc + jax.lax.dot_general(
                    packed,
                    mask,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc = jax.lax.cond(overlap, do_resolve, lambda acc=acc: acc)

        has = best_id < jnp.float32(BIG_ID)
        slam = acc[12:13] * px + acc[13:14] * py + acc[14:15]
        safe_slam = jnp.where(slam == 0.0, 1.0, slam)
        uvx = (acc[16:17] * px + acc[17:18] * py + acc[18:19]) / safe_slam
        uvy = (acc[19:20] * px + acc[20:21] * py + acc[21:22]) / safe_slam
        a = ROWS_COLS
        w = acc[a + 9 : a + 10] / safe_slam  # det / slam
        out_ref[0, layer, 0, :] = best_z[0]
        out_ref[0, layer, 1, :] = uvx[0]
        out_ref[0, layer, 2, :] = uvy[0]
        out_ref[0, layer, 3, :] = w[0]
        for k in range(7):  # tsx tsy bax bay bbx bby light
            out_ref[0, layer, 4 + k, :] = acc[a + k]
        out_ref[0, layer, 11, :] = acc[a + 7]  # pass
        out_ref[0, layer, 12, :] = acc[a + 8]  # transparent
        out_ref[0, layer, 13, :] = has[0].astype(jnp.float32)
        out_ref[0, layer, 14, :] = jnp.zeros((tile_p,), jnp.float32)
        out_ref[0, layer, 15, :] = jnp.zeros((tile_p,), jnp.float32)

        prev_z, prev_id = best_z, best_id


@functools.partial(
    jax.jit, static_argnames=("n_layers", "tile_p", "chunk_t", "interpret")
)
def peel_resolve_pallas(
    tri_rows,  # (B, T, 24) from pack_triangle_rows_full (+ orig-id col 22)
    tri_attrs,  # (B, T, 16) from pack_triangle_attrs
    grid,  # (3, P)
    tri_ybounds,  # (B, T, 2) window-y (min, max) per triangle
    n_layers: int,
    tile_p: int = 512,
    chunk_t: int = 128,
    interpret: bool = False,
):
    """Fused peel + attribute resolve -> (B, K, 16, P) f32 channels.

    Callers should y-sort triangles (with original ids in rows col 22) so
    the per-chunk window-y bounds are tight; whole chunks outside a pixel
    tile's y range are skipped."""
    b, t, _ = tri_rows.shape
    p = grid.shape[1]
    pad_t = (-t) % chunk_t
    if pad_t:
        tri_rows = jnp.pad(tri_rows, ((0, 0), (0, pad_t), (0, 0)))
        tri_attrs = jnp.pad(tri_attrs, ((0, 0), (0, pad_t), (0, 0)))
        tri_ybounds = jnp.pad(
            tri_ybounds, ((0, 0), (0, pad_t), (0, 0)),
            constant_values=jnp.inf,
        )
        # Padded triangles: ymin=+inf, ymax=-inf -> never overlap.
        tri_ybounds = tri_ybounds.at[:, t:, 1].set(-jnp.inf)
    pad_p = (-p) % tile_p
    if pad_p:
        grid = jnp.pad(grid, ((0, 0), (0, pad_p)))
    t_padded, p_padded = t + pad_t, p + pad_p
    n_chunks = t_padded // chunk_t
    cb = tri_ybounds.reshape(b, n_chunks, chunk_t, 2)
    chunk_bounds = jnp.stack(
        [jnp.min(cb[..., 0], axis=2), jnp.max(cb[..., 1], axis=2)], axis=-1
    )  # (B, n_chunks, 2)

    kernel = functools.partial(
        _peel_resolve_kernel, n_layers=n_layers, chunk_t=chunk_t, tile_p=tile_p
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, p_padded // tile_p),
        in_specs=[
            pl.BlockSpec((1, t_padded, ROWS_COLS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_padded, ATTR_COLS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_p), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_layers, OUT_CHANNELS, tile_p), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_layers, OUT_CHANNELS, p_padded), jnp.float32
        ),
        interpret=interpret,
    )(tri_rows, tri_attrs, grid, chunk_bounds)
    return out[..., :p]


# ---------------------------------------------------------------------------
# Portal-renderer record classification.
# ---------------------------------------------------------------------------


def _classify_alpha_kernel(rec_ref, words_ref, scal_ref, bounds_ref, out_ref, *,
                           n_rec, nch, tile_h, w, masked_family, rpc,
                           n_words, height, p11):
    """First-match span classification with IN-KERNEL texel alpha.

    Like `_classify_kernel`, but instead of a precomputed (K, H, W) alpha
    mask it takes the bit-packed per-crossing texture-column alpha WORDS
    (1, K, n_words, W) i32 straight from the walk and evaluates the
    masked-family alpha test per pixel in registers (mirroring
    render/portal._alpha_test op for op, so the jnp fallback stays
    bit-identical). This deletes the dense XLA mask stage and its
    (K, H, W) HBM round trip; solid families still pay nothing.

    scal_ref: SMEM (1, 2) f32 [camera y of this env, packed-alpha height
    hc]; p11/height are compile-time constants.
    """
    j = pl.program_id(1)
    y = (
        jnp.float32(j * tile_h)
        + jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0).astype(jnp.float32)
        + 0.5
    )
    tile_min = jnp.float32(j * tile_h) + 0.5
    tile_max = jnp.float32(j * tile_h + tile_h) - 0.5
    cam_y = scal_ref[0, 0, 0]
    hc = scal_ref[0, 0, 1].astype(jnp.int32)
    ndc_y = 1.0 - 2.0 * y / jnp.float32(height)  # (tile_h, w)

    # Output = record channels [2:13) (KIND..HIGH -- all the shade
    # kernel consumes, laid out contiguously): the per-record output
    # round trip is the kernel's dominant cost, so writing 11 channels
    # instead of 16 is a direct ~30% cut.
    out_ref[0] = jnp.zeros((11, tile_h, w), jnp.float32)
    for r in range(n_rec):
        overlap = (bounds_ref[0, r, 0] <= tile_max) & (
            bounds_ref[0, r, 1] >= tile_min
        )
        # First-match: once every pixel in the tile is classified
        # (kind != 0 everywhere), later records cannot contribute.
        not_done = jnp.min(out_ref[0, 0]) == 0.0

        @pl.when(overlap & not_done)
        def _(r=r):
            cur = out_ref[0]
            done = cur[0] != 0.0  # R_KIND of the first match so far
            rec = rec_ref[0, r]  # (NCH, W)
            y0 = rec[0, :][None, :]
            y1 = rec[1, :][None, :]
            hit = ~done & (y >= y0) & (y < y1)
            if r % rpc == masked_family:  # static: only middles pay this
                # Texel alpha bit, exactly as render/portal._alpha_test.
                w_ch = rec[8, :][None, :]  # R_W
                low = rec[11, :][None, :]  # R_LOW
                high = rec[12, :][None, :]  # R_HIGH
                t1 = rec[9, :][None, :]  # R_T1
                t2 = rec[10, :][None, :]  # R_T2
                tsy = rec[5, :][None, :]  # R_TSY
                ay = rec[15, :][None, :]  # R_AY
                masked = rec[13, :][None, :] > 0.5  # R_MASKED
                h_at = cam_y + ndc_y * w_ch / jnp.float32(p11)
                dh = high - low
                dh = jnp.where(dh == 0.0, 1.0, dh)
                v = t1 + (t2 - t1) * (h_at - low) / dh
                vv = jnp.mod(v, jnp.where(tsy == 0.0, 1.0, tsy)) + ay
                y_t = jnp.mod(jnp.floor(vv).astype(jnp.int32), hc)
                wi = y_t >> 5
                bit = y_t & 31
                wsel = jnp.zeros((tile_h, w), jnp.int32)
                for wd in range(n_words):
                    wsel = jnp.where(
                        wi == wd, words_ref[0, r // rpc, wd, :][None, :], wsel
                    )
                alpha = ((wsel >> bit) & 1) == 1
                # Pure i1 algebra (a bool where() needs an i8->i1
                # truncation Mosaic does not lower).
                hit = hit & (~masked | alpha)
            # Two-step slice: the combined rec[2:13, None, :] form routes
            # through lax.gather, which Mosaic cannot lower.
            rec_out = jax.lax.slice_in_dim(rec, 2, 13, axis=0)
            out_ref[0] = jnp.where(hit[None], rec_out[:, None, :], cur)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "p11", "tile_h", "interpret", "masked_family", "rpc"
    ),
)
def classify_alpha_pallas(
    records,  # (B, R, NCH, W) f32
    words,  # (B, K, n_words, W) i32 bit-packed masked-texel alpha
    cam_y,  # (B,) f32 camera y per env
    hc,  # () or (B,) i32/f32: packed alpha column height
    height: int,
    p11: float,
    tile_h: int = 32,
    interpret: bool = False,
    masked_family: int = 3,
    rpc: int = 5,
):
    """(B, R, NCH, W) span records -> (B, 11, H, W): the first-match
    record's channels [KIND..HIGH] (see render/portal's layout), with
    the masked-family alpha test fused in. Channel 0 (kind) is 0 where
    no record matched."""
    b, n_rec, nch, w = records.shape
    n_words = words.shape[2]
    pad_w = (-w) % 128
    if pad_w:
        records = jnp.pad(records, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
        # Padded columns: make y-spans empty.
        records = records.at[:, :, 1, w:].set(-1e9)
        words = jnp.pad(words, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
    w_padded = w + pad_w
    pad_h = (-height) % tile_h
    h_padded = height + pad_h

    bounds = jnp.stack(
        [jnp.min(records[:, :, 0, :], axis=-1), jnp.max(records[:, :, 1, :], axis=-1)],
        axis=-1,
    )  # (B, R, 2)
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(cam_y, jnp.float32), (b,)),
            jnp.broadcast_to(jnp.asarray(hc, jnp.float32), (b,)),
        ],
        axis=-1,
    ).reshape(b, 1, 2)  # (B, 1, 2); 3D so the SMEM block (1, 1, 2) keeps
    # its last two dims equal to the array's (Mosaic block-shape rule)

    kernel = functools.partial(
        _classify_alpha_kernel, n_rec=n_rec, nch=nch,
        tile_h=tile_h, w=w_padded, masked_family=masked_family, rpc=rpc,
        n_words=n_words, height=height, p11=float(p11),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h_padded // tile_h),
        in_specs=[
            pl.BlockSpec((1, n_rec, nch, w_padded), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, words.shape[1], n_words, w_padded),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_rec, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 11, tile_h, w_padded), lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 11, h_padded, w_padded), jnp.float32),
        interpret=interpret,
    )(records, words, scal, bounds)
    return out[:, :, :height, :w]


# ---------------------------------------------------------------------------
# Fused portal render kernel: classify + shade in one pallas_call.
# ---------------------------------------------------------------------------


def _render_fused_kernel(rec_ref, words_ref, scal_ref, bounds_ref, dxz_ref,
                         sky_ref, tex_ref, hole_ref, cmap_ref, plan_ref,
                         holeg_ref,
                         idx_ref, cov_ref, ch_ref, flat_ref, res_ref, *,
                         n_rec, tile_h,
                         w, masked_family, rpc, n_words, height, p11, n_rows,
                         S1, Sh, S2, holeless=False, per_env_tex=False,
                         gated=False):
    """Classify + shade fused: the (11, H, W) classified-channel image
    never leaves VMEM (the separate kernels round-trip it through HBM --
    ~180 MB at B=64, 320x200 -- and the shade kernel's flat-pixel layout
    forces dense (B, 2, H*W) ray and (B, H*W) sky operands; here rays
    are (2, W) rows and both stages share one h-tile).

    Stage 1 mirrors `_classify_alpha_kernel` into the `ch_ref` scratch;
    stage 2 mirrors `_shade_kernel` on the (tile_h, w) tile, running the
    compact-table MXU lookups one image row at a time (pixels stay on
    lanes; a (tile_h, w) -> (tile_h*w,) flatten would relayout).
    Formulas are bit-identical to the jnp reference path."""
    j = pl.program_id(1)
    y = (
        jnp.float32(j * tile_h)
        + jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0).astype(jnp.float32)
        + 0.5
    )
    cam_x = scal_ref[0, 0, 0]
    cam_y = scal_ref[0, 0, 1]
    cam_z = scal_ref[0, 0, 2]
    hc = scal_ref[0, 0, 3].astype(jnp.int32)
    shear = scal_ref[0, 0, 4]  # pitch y-shear in ndc (0 at zero pitch)
    # Geometry ndc-y = screen ndc + shear (records carry sheared rows;
    # the flat/wall inverse mappings below must shear back identically).
    ndc_y = 1.0 - 2.0 * y / jnp.float32(height) + shear  # (tile_h, w)

    # --- stage 1: first-match classification (see _classify_alpha_kernel)
    # Whether a RECORD can contribute any pixel to this tile is
    # precomputed in XLA from its nonempty per-column spans (see the
    # plan in render_portal_fused_pallas) and read as one SMEM scalar:
    # each skipped record saves its whole 11-channel masked select (the
    # dominant classify VPU cost -- a crossing typically contributes 1-2
    # of its rpc families to a 40-row band, not all 5). First-match
    # order is preserved by SEQUENTIAL gated read-modify-writes of
    # ch_ref in record order, each taking only still-unclassified
    # pixels (ch kind == 0); this replaces the old per-crossing value
    # carry, the tile-bounds check, and the old in-kernel
    # fully-classified vector reduction (which serialized the loop).
    ch_ref[...] = jnp.zeros((11, tile_h, w), jnp.float32)

    def _classify_record(k, fam, r_i):
        """One record's gated first-match select; k/fam/r_i may be traced
        (rolled loop) or Python ints (unrolled loop) -- the body is
        identical, so both variants are bit-equal by construction."""

        @pl.when(bounds_ref[0, r_i, j] > 0)
        def _():
            out = ch_ref[...]
            done = out[0] != 0.0
            rec = rec_ref[0, r_i]  # (NCH, W)
            y0 = rec[0, :][None, :]
            y1 = rec[1, :][None, :]
            hit = ~done & (y >= y0) & (y < y1)
            if fam == masked_family:
                w_ch = rec[8, :][None, :]  # R_W
                low = rec[11, :][None, :]  # R_LOW
                high = rec[12, :][None, :]  # R_HIGH
                t1 = rec[9, :][None, :]  # R_T1
                t2 = rec[10, :][None, :]  # R_T2
                tsy = rec[5, :][None, :]  # R_TSY
                ay = rec[15, :][None, :]  # R_AY
                masked = rec[13, :][None, :] > 0.5  # R_MASKED
                h_at = cam_y + ndc_y * w_ch / jnp.float32(p11)
                dh = high - low
                dh = jnp.where(dh == 0.0, 1.0, dh)
                v = t1 + (t2 - t1) * (h_at - low) / dh
                vv = jnp.mod(v, jnp.where(tsy == 0.0, 1.0, tsy)) + ay
                y_t = jnp.mod(jnp.floor(vv).astype(jnp.int32), hc)
                wi = y_t >> 5
                bit = y_t & 31
                wsel = jnp.zeros((tile_h, w), jnp.int32)
                for wd in range(n_words):
                    wsel = jnp.where(
                        wi == wd, words_ref[0, k, wd, :][None, :], wsel
                    )
                alpha = ((wsel >> bit) & 1) == 1
                hit = hit & (~masked | alpha)
            rec_out = jax.lax.slice_in_dim(rec, 2, 13, axis=0)
            ch_ref[...] = jnp.where(hit[None], rec_out[:, None, :], out)

    if n_rec <= ROLL_CLASSIFY_ABOVE:
        for r_i in range(n_rec):
            _classify_record(r_i // rpc, r_i % rpc, r_i)
    else:
        # ROLLED variant for big record counts (portal_compact_crossings
        # >= ~16, i.e. deep real-WAD corridors): the fully unrolled
        # classify at n_rec=120 produced a kernel program large enough to
        # CRASH the TPU worker at launch (r4 "tuned texstress"; 40- and
        # 60-record programs run fine, the failure appears between 60 and
        # 120 records). A lax.fori_loop over crossings keeps the program
        # at one crossing's size (rpc record bodies); first-match order
        # is preserved because fori_loop is sequential. The family index
        # stays a PYTHON int (the masked-family body differs), so only
        # the crossing index is traced.
        def k_body(k, _):
            for fam in range(rpc):
                _classify_record(k, fam, k * rpc + fam)
            return 0

        jax.lax.fori_loop(0, n_rec // rpc, k_body, 0)

    # --- stage 2: shading (see _shade_kernel; 2-D (tile_h, w) tiles) ---
    ch = lambda c: ch_ref[c]
    kind = ch(0)
    covered0 = kind != 0.0
    is_sky = kind == 3.0
    is_wall = kind == 2.0
    is_decor = kind == 4.0
    wall_like = is_wall | is_decor
    dx = dxz_ref[0, 0][None, :]  # (1, w): rays vary only along x
    dz = dxz_ref[0, 1][None, :]

    plane_h = ch(1)
    safe_ndc = jnp.where(jnp.abs(ndc_y) < 1e-9, 1e-9, ndc_y)
    t_flat = jnp.float32(p11) * (plane_h - cam_y) / safe_ndc
    flat_u = -(cam_x + dx * t_flat) * 100.0
    flat_v = -(cam_z + dz * t_flat) * 100.0
    h_at = cam_y + ndc_y * ch(6) / jnp.float32(p11)
    dh = ch(10) - ch(9)
    dh = jnp.where(dh == 0.0, 1.0, dh)
    wall_v = ch(7) + (ch(8) - ch(7)) * (h_at - ch(9)) / dh
    uu = jnp.where(wall_like, ch(1), flat_u)
    vv = jnp.where(wall_like, wall_v, flat_v)
    ts_x = jnp.where(ch(2) == 0.0, 1.0, ch(2))
    ts_y = jnp.where(ch(3) == 0.0, 1.0, ch(3))
    lx = jnp.floor(jnp.mod(uu, ts_x))
    ly = jnp.floor(jnp.mod(vv, ts_y))
    lin = (ch(4) + ly * (ch(2) + 1.0) + lx).astype(jnp.int32)
    lin = jnp.clip(lin, 0, S1 * 128 - 1)

    w_pix = jnp.where(wall_like | (is_sky & (ch(6) > 0.0)), ch(6), t_flat)
    light = ch(5)
    dist_s = jnp.minimum(1.0, 1.0 - 0.9 / (w_pix + 0.9))
    dist_d = jnp.minimum(1.0, 1.0 - 1.0 / (w_pix + 1.0))
    lval = jnp.where(
        is_decor,
        jnp.minimum(light, light * 2.0 - dist_d),
        light * 2.0 - dist_s,
    )
    crow = jnp.clip(
        jnp.floor((1.0 - lval) * jnp.float32(n_rows)).astype(jnp.int32),
        0, n_rows - 1,
    )

    # MXU lookups: flatten (tile_h, w) -> (tile_h*w,) so each lookup is
    # a big dot on lanes (per-row dots at N=w stall the MXU: measured
    # 21.6 ms vs 13.9 for the unfused pair at B=64). Mosaic cannot
    # shape-cast sublanes into lanes, so the flatten goes through a VMEM
    # scratch: row stores at 128-aligned lane offsets, flat reads.
    for r in range(tile_h):
        flat_ref[0, pl.ds(r * w, w)] = lin[r]
        flat_ref[1, pl.ds(r * w, w)] = crow[r]
    # The lookups run in ROW GROUPS of RG image rows: a narrow band
    # shows few distinct surfaces, so the gated tex lookup skips most
    # table blocks (whole-tile indices span far more); the (128, n)
    # column intermediates also shrink by tile_h/RG, easing VMEM.
    RG = 8 if tile_h % 8 == 0 else tile_h
    import os as _os
    _rg = _os.environ.get("TPU_DOOM_RG")  # trace-time A/B hook:
    # ungated lookups may prefer wider row groups (bigger MXU dots)
    if _rg and not gated and tile_h % int(_rg) == 0:
        RG = int(_rg)
    n = RG * w
    for g in range(tile_h // RG):
        sl = pl.ds(g * n, n)
        lin_f = flat_ref[0, sl]
        crow_f = flat_ref[1, sl]
        # plan_ref holds ALL row groups of the frame (SMEM blocks must
        # span full trailing dims); this tile's groups start at j*(
        # tile_h // RG).
        # Block gating pays only when most blocks skip: the pl.when
        # branches break Mosaic's matmul pipelining (measured -6% on the
        # 5-block driver table even with free SMEM gates), so SMALL
        # tables run the straight lookup and big ones (notably the
        # active-set per-env tables, whose live blocks are a prefix of
        # the slot_start cumsum) run the planned one.
        gate = lambda b, g=g: plan_ref[0, j * (tile_h // RG) + g, b] > 0
        if per_env_tex:
            # Active-set path: this env's gathered table (values 0..255,
            # 256 = hole -- bf16-exact, so hole rides the value and no
            # separate hole lookup exists).
            if gated:
                v1f = _mxu_lookup_planned(
                    lin_f, lambda s0, bs: tex_ref[0, s0:s0 + bs], S1, n,
                    gate, res_ref, i8=False,
                )
            else:
                v1f = _mxu_lookup(lin_f, tex_ref[0], S1, n)
            hole_f = v1f == 256.0
            v1 = jnp.minimum(v1f, 255.0).astype(jnp.int32)
        else:
            if gated:
                v1 = _mxu_lookup_planned(
                    lin_f, lambda s0, bs: tex_ref[s0:s0 + bs], S1, n,
                    gate, res_ref,
                )
            else:
                v1 = _mxu_lookup_i8(lin_f, tex_ref[...], S1, n)
            if holeless:
                # No non-masked cell has a transparent texel (static
                # pack-time fact), so the transparency lookup is provably
                # all-zero: masked-record pixels passed the classify alpha
                # test and sample opaque texels by construction.
                hole_f = jnp.zeros((n,), jnp.bool_)
            else:
                # Per-TILE transparency gate: holeg_ref[0, j] is 1 iff
                # some record of this tile can sample a holey cell
                # (conservative cbase-range test in XLA). Most tiles
                # contain no holey surface, and skipping the lookup +
                # bit extract there measured +12% on the whole driver
                # point. res_ref is free here: the ungated path never
                # touches it, and the gated texel lookup above has
                # already been read out into v1.
                res_ref[...] = jnp.zeros((n,), jnp.int32)

                @pl.when(holeg_ref[0, j] > 0)
                def _(lin_f=lin_f):
                    hbyte = _mxu_lookup_i8(
                        lin_f >> 3, hole_ref[...], Sh, n)
                    res_ref[...] = (hbyte >> (lin_f & 7)) & 1

                hole_f = res_ref[...] == 1
        idx2 = crow_f * 256 + v1
        v2 = _mxu_lookup_i8(idx2, cmap_ref[...], S2, n).astype(jnp.float32)
        for rr in range(RG):
            r = g * RG + rr
            covered = covered0[r] & (is_sky[r] | ~hole_f[rr * w:(rr + 1) * w])
            val = jnp.where(is_sky[r], sky_ref[0, r], v2[rr * w:(rr + 1) * w])
            idx_ref[0, r, :] = jnp.where(covered, val, 0.0)
            cov_ref[0, r, :] = covered.astype(jnp.float32)


def _lookup_plan(records, h_padded, rg, nb):
    """Span records (B, R, NCH, W) -> gating plan (B, h_padded//rg, nb)
    i32 for the kernel's block-gated texel lookup: plan[g, b] = 1 iff
    some FLAT/WALL/DECOR record covers a pixel row of group g at a
    column whose compact-table segment block could be b. A record's
    texels lie within [cbase, cbase + (tsx+1)(tsy+1) - 1]
    (frame-resolved cbase, +1 mod-guards included, lin never clips for
    active records); the row test mirrors the kernel's
    y >= y0 & y < y1 on the group's first/last pixel rows. Sky and
    uncovered pixels carry garbage lin but never consume the texel
    value, so they contribute nothing to the plan.

    PER-COLUMN sharpness is load-bearing: an r5 experiment reduced over
    the column axis first (per-record bounding bands -> tiny (B, R, G) x
    (B, R, NB) intermediates, motivated by the dense form's apparent
    (B, R, W, NB) HBM cost), and the looser plan enabled enough extra
    blocks to cost 18% of the whole :texstress: point (1215 vs 1483
    env-fps, B=64) -- XLA fuses the dense one-hots into the matmul, so
    the "saved" traffic was never paid, while every falsely-enabled
    block is real MXU work in the gated lookup. One bool matmul:
    (G, R*W) @ (R*W, NB) per env."""
    y0 = records[:, :, 0]  # (B, R, W)
    y1 = records[:, :, 1]
    kind = records[:, :, 2]
    tsx = records[:, :, 4]
    tsy = records[:, :, 5]
    cbase = records[:, :, 6]
    active = (kind != 0.0) & (kind != 3.0)  # flat/wall/decor
    span = (tsx + 1.0) * (tsy + 1.0)
    blo = jnp.clip(cbase / 16384.0, 0, nb - 1).astype(jnp.int32)
    bhi = jnp.clip((cbase + span - 1.0) / 16384.0, 0, nb - 1).astype(
        jnp.int32
    )
    g = jnp.arange(h_padded // rg, dtype=jnp.float32)
    gfirst = g * rg + 0.5  # first pixel-row y of group g
    glast = g * rg + (rg - 1) + 0.5  # last pixel-row y
    grows = (
        (y1[..., None] > gfirst) & (y0[..., None] <= glast)
        & active[..., None]
    )  # (B, R, W, G)
    b = jnp.arange(nb)
    binb = (b >= blo[..., None]) & (b <= bhi[..., None])  # (B, R, W, NB)
    bsz = records.shape[0]
    gm = grows.reshape(bsz, -1, g.shape[0]).astype(jnp.float32)
    bm = binb.reshape(bsz, -1, nb).astype(jnp.float32)
    return (
        jnp.einsum("brg,brn->bgn", gm, bm,
                   preferred_element_type=jnp.float32) > 0.0
    ).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "p11", "n_rows", "tile_h", "interpret", "masked_family",
        "rpc", "holeless", "per_env_tex",
    ),
)
def render_portal_fused_pallas(
    records,  # (B, R, NCH, W) f32
    words,  # (B, K, n_words, W) i32 bit-packed masked-texel alpha
    cam,  # (B, 3) f32 camera position
    hc,  # () or (B,): packed alpha column height
    dxz,  # (B, 2, W) f32 per-column ray XZ direction
    sky_img,  # (B, H, W) f32 colormapped sky palette values
    tex_i8,  # (S1, 128) s8 compact texel table (texel - 128); with
    #   per_env_tex: (B, S_active, 128) bf16 per-env active tables
    #   (values 0..255, 256 = hole)
    hole_bytes,  # (Sh, 128) s8 packed transparency bits (byte - 128)
    cmap_i8,  # (S2, 128) s8 colormap (value - 128)
    height: int,
    p11: float,
    n_rows: int,
    tile_h: int = 32,
    interpret: bool = False,
    masked_family: int = 3,
    rpc: int = 5,
    holeless: bool = False,
    shear=None,  # (B,) f32 pitch y-shear in ndc units; None = zeros
    per_env_tex: bool = False,
    hole_ranges=None,  # (Hn, 2) f32 [start, end) dense-table texel
    # ranges of holey non-masked cells; enables the per-tile
    # transparency-lookup gate. None = gate always on (exact, slower).
):
    """Fused classify+shade: (B, R, NCH, W) span records -> (final palette
    index (B, H, W) f32, covered (B, H, W) f32). Bit-identical to
    classify_alpha_pallas + shade_portal_pallas."""
    b, n_rec, nch, w = records.shape
    n_words = words.shape[2]
    S1 = tex_i8.shape[1] if per_env_tex else tex_i8.shape[0]
    Sh = hole_bytes.shape[0]
    S2 = cmap_i8.shape[0]
    pad_w = (-w) % 128
    if pad_w:
        records = jnp.pad(records, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
        records = records.at[:, :, 1, w:].set(-1e9)
        words = jnp.pad(words, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
        dxz = jnp.pad(dxz, ((0, 0), (0, 0), (0, pad_w)))
        sky_img = jnp.pad(sky_img, ((0, 0), (0, 0), (0, pad_w)))
    w_padded = w + pad_w
    pad_h = (-height) % tile_h
    h_padded = height + pad_h
    if pad_h:
        sky_img = jnp.pad(sky_img, ((0, 0), (0, pad_h), (0, 0)))

    # Per-(record, tile) classify plan: record r can contribute to tile
    # j iff its bounding row range over NONEMPTY columns overlaps the
    # tile's pixel rows. Sharper than the old per-crossing bounds (a
    # crossing's ceiling+floor+wall families together span most of the
    # screen; each record alone is a narrow band) at O(B*R*W) cost --
    # empty columns (y0 >= y1: classified in front, or the family
    # doesn't exist on that crossing) contribute nothing.
    n_tiles = h_padded // tile_h
    y0r = records[:, :, 0, :]  # (B, R, W)
    y1r = records[:, :, 1, :]
    ne = y1r > y0r
    y0m = jnp.min(jnp.where(ne, y0r, jnp.inf), axis=-1)  # (B, R)
    y1m = jnp.max(jnp.where(ne, y1r, -jnp.inf), axis=-1)
    tl = jnp.arange(n_tiles, dtype=jnp.float32) * tile_h + 0.5
    th = tl + (tile_h - 1.0)
    bounds = (
        (y0m[..., None] <= th) & (y1m[..., None] > tl)
    ).astype(jnp.int32)  # (B, R, T)
    hcb = jnp.broadcast_to(
        jnp.asarray(hc, jnp.float32).reshape(-1), (b,)
    )
    shb = (
        jnp.zeros((b,), jnp.float32) if shear is None
        else jnp.asarray(shear, jnp.float32)
    )
    scal = jnp.concatenate(
        [jnp.asarray(cam, jnp.float32), hcb[:, None], shb[:, None]],
        axis=-1,
    ).reshape(b, 1, 5)

    rg = 8 if tile_h % 8 == 0 else tile_h
    nb = -(-S1 // 128)
    # Gate only big tables (see kernel comment): ungated for the small
    # global tables, planned gating for active-set-sized ones.
    gated = nb >= 8
    plan = (
        _lookup_plan(records, h_padded, rg, nb) if gated
        else jnp.zeros((b, h_padded // rg, nb), jnp.int32)
    )
    # Per-tile transparency gate (see kernel): tile j needs the hole
    # lookup iff some flat/wall record whose [cbase, cbase+span) texel
    # window intersects a holey cell can cover a row of the tile. The
    # row test reuses the per-record tile `bounds`; the range test is
    # conservative (records' cbase is gated to 0 on dead columns, which
    # can only over-enable).
    if holeless or hole_ranges is None:
        tile_hole = jnp.ones((b, n_tiles), jnp.int32)
    else:
        kindr = records[:, :, 2]  # (B, R, W)
        cbase = records[:, :, 6]
        span = (records[:, :, 4] + 1.0) * (records[:, :, 5] + 1.0)
        nonmasked = (
            (kindr != 0.0) & (kindr != 3.0)
            & (records[:, :, 13] < 0.5)
        )
        rs = hole_ranges[:, 0]  # (Hn,)
        re = hole_ranges[:, 1]
        hit = (
            (cbase[..., None] < re) & ((cbase + span)[..., None] > rs)
        )  # (B, R, W, Hn)
        rec_holey = jnp.any(
            hit & nonmasked[..., None], axis=(2, 3)
        ).astype(jnp.float32)  # (B, R)
        tile_hole = (
            jnp.einsum("brt,br->bt", bounds.astype(jnp.float32),
                       rec_holey, preferred_element_type=jnp.float32)
            > 0.0
        ).astype(jnp.int32)

    kernel = functools.partial(
        _render_fused_kernel, n_rec=n_rec, tile_h=tile_h, w=w_padded,
        masked_family=masked_family, rpc=rpc, n_words=n_words,
        height=height, p11=float(p11), n_rows=n_rows, S1=S1, Sh=Sh, S2=S2,
        holeless=holeless, per_env_tex=per_env_tex, gated=gated,
    )
    tex_spec = (
        pl.BlockSpec((1, S1, 128), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if per_env_tex
        else pl.BlockSpec((S1, 128), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    )
    out_idx, out_cov = pl.pallas_call(
        kernel,
        grid=(b, h_padded // tile_h),
        in_specs=[
            pl.BlockSpec((1, n_rec, nch, w_padded), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, words.shape[1], n_words, w_padded),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 5), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_rec, n_tiles), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, w_padded), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w_padded), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            tex_spec,
            pl.BlockSpec((Sh, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h_padded // rg, nb), lambda i, j: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, n_tiles), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w_padded), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w_padded), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_padded, w_padded), jnp.float32),
            jax.ShapeDtypeStruct((b, h_padded, w_padded), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((11, tile_h, w_padded), jnp.float32),
            pltpu.VMEM((2, tile_h * w_padded), jnp.int32),
            # Gated-lookup result accumulator, one RG-row group wide.
            pltpu.VMEM(
                (rg * w_padded,),
                jnp.float32 if per_env_tex else jnp.int32,
            ),
        ],
        interpret=interpret,
    )(records, words, scal, bounds, dxz, sky_img, tex_i8, hole_bytes,
      cmap_i8, plan, tile_hole)
    return out_idx[:, :height, :w], out_cov[:, :height, :w]


# ---------------------------------------------------------------------------
# Active-set gather: per-env visible-cell texel tables (big-texture levels).
# ---------------------------------------------------------------------------


def _gather_cells_kernel(meta_ref, tex_ref, out_ref, *, n_cells, s_out):
    """Copy each visible cell's global segment run into its per-env
    active slot: meta (1, C, 3) i32 = [gseg0_blk, slot_blk, nblk8] in
    8-ROW BLOCK units (nblk8 is 0 for invisible cells). Block units are
    load-bearing: Mosaic only lowers dynamic-offset (8, 128) vector
    loads/stores whose row offset is STATICALLY a multiple of 8, so the
    offsets are written as blk * 8 (cell bases are 8-seg aligned at
    pack time, slots allocate in 8-seg units; the global table carries
    +8 guard rows, the output +8 slack rows)."""
    out_ref[...] = jnp.zeros((1, s_out, 128), jnp.bfloat16)

    def cell_body(c, _):
        g_blk = meta_ref[0, c, 0]
        s_blk = meta_ref[0, c, 1]
        nb = meta_ref[0, c, 2]

        def blk(i, _):
            out_ref[0, pl.ds((s_blk + i) * 8, 8), :] = tex_ref[
                pl.ds((g_blk + i) * 8, 8), :
            ]
            return 0

        jax.lax.fori_loop(0, nb, blk, 0)
        return 0

    jax.lax.fori_loop(0, n_cells, cell_body, 0)


@functools.partial(
    jax.jit, static_argnames=("active_segs", "interpret")
)
def gather_cells_pallas(
    meta,  # (B, C, 3) i32 [gseg0_blk, slot_blk, nblk8] per cell (8-row
    #   block units; see _gather_cells_kernel)
    tex_full,  # (S1g + 8, 128) bf16 global table (values 0..256)
    active_segs: int,
    interpret: bool = False,
):
    """-> (B, active_segs, 128) bf16 per-env active texel tables."""
    b, n_cells, _ = meta.shape
    s_out = active_segs + 8  # tail-block slack
    out = pl.pallas_call(
        functools.partial(
            _gather_cells_kernel, n_cells=n_cells, s_out=s_out
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_cells, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tex_full.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_out, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_out, 128), jnp.bfloat16),
        interpret=interpret,
    )(meta, tex_full)
    return out[:, :active_segs]


# ---------------------------------------------------------------------------
# MXU row select: out[n, :] = table[idx[n], :] with pixels on LANES.
# ---------------------------------------------------------------------------


def split3_bf16(x):
    """Exact 3-way bf16 split of an f32 array: x == hi + mid + lo with
    every term bf16 (8+8+8 >= 24 mantissa bits). One-hot matmuls against
    the three planes summed in f32 reproduce the f32 values BIT-EXACTLY
    (each partial product selects one term; the terms occupy disjoint
    bit ranges, so the f32 additions are exact). This is what
    Precision.HIGHEST does internally, but done once at the TABLE --
    the (K, W, S) one-hot side stays a single bf16 operand instead of
    an f32 pair, and with the select KERNEL it never leaves VMEM.

    The rounding steps MUST be lax.reduce_precision, not
    `astype(bf16).astype(f32)` round-trips: inside a jit, XLA's TPU
    pipeline elides f32->bf16->f32 convert pairs as excess-precision
    no-ops, which collapses `x - f32(bf16(x))` to zero -- mid/lo become
    0 and the "exact" select silently degrades to plain bf16 rounding.
    That elision produced a REAL 27k-px hardware mismatch on the
    :texstress: verify leg while eager micro-tests (no surrounding jit,
    nothing to elide) passed. reduce_precision is a first-class HLO op
    the simplifier keeps, and the final bf16 casts below are
    value-exact (each term already has <= 8 significant mantissa
    bits)."""
    hi = jax.lax.reduce_precision(x, 8, 7)  # bf16-rounded, still f32
    r1 = x - hi
    mid = jax.lax.reduce_precision(r1, 8, 7)
    lo = r1 - mid
    return jnp.stack([hi, mid, lo]).astype(jnp.bfloat16)


def _select_rows_kernel(idx_ref, tab_ref, out_ref, *, P, S, C, N,
                        block=128):
    """One env: out (C, N) f32 = sum_p tabP[p, idx, :] -- with P=3 bf16
    split planes (split3_bf16) this is an EXACT f32 row select; with
    P=1 it selects a bf16-exact table (e.g. byte values). The (S, N)
    one-hot lives only in VMEM block by block -- the XLA einsum
    formulation materializes it at (K, W, S) f32 in HBM and streams it
    once per einsum (prefix cols + full attributes + seg-live: measured
    ~55 ms of the 98 ms texstress render tick at B=64 was this walk)."""
    hi = idx_ref[0, :][None, :]  # (1, N)
    out_ref[...] = jnp.zeros((C, N), jnp.float32)
    for s0 in range(0, S, block):
        bs = min(block, S - s0)
        seg = jax.lax.broadcasted_iota(jnp.int32, (bs, N), 0) + s0
        oh = (seg == hi).astype(jnp.bfloat16)
        for p in range(P):
            tb = tab_ref[p, pl.ds(s0, bs), :]
            out_ref[...] += jax.lax.dot_general(
                tb, oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, N)


@functools.partial(jax.jit, static_argnames=("interpret",))
def select_rows_pallas(idx, tabp, interpret: bool = False):
    """idx (N,) i32 in [0, S) -> (C, N) f32 table rows (exact with the
    P=3 split3_bf16 planes; P=1 for bf16-exact tables). tabp
    (P, S, C) bf16 with S a multiple of 128, C of 8, N of 128 (caller
    pads). Safe under jax.vmap (the batch axis becomes a leading grid
    dimension)."""
    P, S, C = tabp.shape
    N = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_select_rows_kernel, P=P, S=S, C=C, N=N),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, S, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
        interpret=interpret,
    )(idx[None, :], tabp)


def _scatter_live_kernel(idx_ref, live_ref, cnt_ref, *, S, N, block=128):
    """cnt (S,) f32: per-table-row total of live[n] over the positions
    selecting that row (the active-set seg-live reduction), built from
    the same in-VMEM block one-hot as _select_rows_kernel."""
    hi = idx_ref[0, :][None, :]
    live = live_ref[0, :][None, :]  # (1, N) f32
    for s0 in range(0, S, block):
        bs = min(block, S - s0)
        seg = jax.lax.broadcasted_iota(jnp.int32, (bs, N), 0) + s0
        oh = (seg == hi).astype(jnp.float32)
        cnt_ref[0, pl.ds(s0, bs)] = jnp.sum(oh * live, axis=1)


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def scatter_live_pallas(idx, live, S: int, interpret: bool = False):
    """idx (N,) i32 in [0, S); live (N,) f32 -> (S,) f32 live-mass per
    row. S a multiple of 8, N of 128. Safe under jax.vmap."""
    N = idx.shape[0]
    cnt = pl.pallas_call(
        functools.partial(_scatter_live_kernel, S=S, N=N),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S), jnp.float32),
        interpret=interpret,
    )(idx[None, :], live[None, :])
    return cnt[0]


# ---------------------------------------------------------------------------
# Portal-renderer fragment shading (compact-table MXU lookups).
# ---------------------------------------------------------------------------


def _mxu_lookup(idx_i32, tab, S, tile):
    """Table lookup with NO gather instruction and NO relayout: pixels
    stay on LANES throughout. One-hot over the table's 128-entry
    segments is built as (S, tile) -- broadcasting the lane-major index
    vector along sublanes is free -- and contracted with the table on
    the MXU as (128, S) @ (S, tile); a second one-hot picks the
    128-lane entry via a sublane reduction (VPU). Exact for table
    values <= 256 (bf16 integers). XLA's dense gather costs ~8
    ns/element on TPU; a (tile, S)-oriented formulation pays a huge
    lane->sublane relayout for idx[:, None] -- this orientation doesn't.
    `tab` is the loaded (S, 128) table array (any bf16-exact dtype)."""
    hi = (idx_i32 >> 7)[None, :]  # (1, tile)
    lo = (idx_i32 & 127)[None, :]
    seg = jax.lax.broadcasted_iota(jnp.int32, (S, tile), 0)
    oh = (seg == hi).astype(jnp.bfloat16)  # (S, tile)
    cols = jax.lax.dot_general(
        tab.astype(jnp.bfloat16), oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (128, tile): per pixel, its segment's 128 entries on sublanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    ohl = (lane == lo).astype(jnp.float32)
    return jnp.sum(cols * ohl, axis=0)  # (tile,)


def _mxu_lookup_planned(idx_i32, read_rows, S, n, gate, res_ref,
                        block=128, i8=True):
    """Block-gated _mxu_lookup(_i8): the (S, 128) table is processed in
    `block`-segment chunks, each skipped ENTIRELY (one-hot build + MXU
    matmul + lane select) when the precomputed PLAN says no pixel of
    this row group indexes into it. The plan is built in XLA from the
    span records (exact per row-group x block; see _lookup_plan) and
    read here as SMEM scalars -- in-kernel vector-reduction gating was
    measured 19% SLOWER end-to-end than no gating at all, while scalar
    gates are free. Skipped blocks contribute zero; gated-off pixels
    (sky / uncovered, whose lin is garbage) read 0 and their value is
    ignored downstream, so the result is exact for every consumed pixel.
    Each block's (128, n) column matrix is lane-selected immediately and
    accumulated into the (n,) res_ref scratch (i32 for i8 tables, f32
    otherwise) -- no (128, n) accumulator round-trips VMEM.
    read_rows(s0, bs) -> the table's (bs, 128) row slice; gate(b) -> the
    block's scalar plan flag."""
    hi = (idx_i32 >> 7)[None, :]
    lo = (idx_i32 & 127)[None, :]
    acc_dtype = jnp.int32 if i8 else jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    ohl = (lane == lo).astype(acc_dtype)
    res_ref[...] = jnp.zeros((n,), acc_dtype)
    for b, s0 in enumerate(range(0, S, block)):
        bs = min(block, S - s0)

        @pl.when(gate(b))
        def _(s0=s0, bs=bs):
            seg = jax.lax.broadcasted_iota(jnp.int32, (bs, n), 0) + s0
            tb = read_rows(s0, bs)
            if i8:
                oh = (seg == hi).astype(jnp.int8)
            else:
                oh = (seg == hi).astype(jnp.bfloat16)
                tb = tb.astype(jnp.bfloat16)
            cols = jax.lax.dot_general(
                tb, oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            res_ref[...] += jnp.sum(cols * ohl, axis=0)
    if i8:
        return res_ref[...] + 128
    return res_ref[...]


def _mxu_lookup_i8(idx_i32, tab, S, tile):
    """int8 variant of _mxu_lookup: exact integer arithmetic at 2x the
    bf16 MXU rate. Table entries are value-128 (s8); returns [0, 255]."""
    hi = (idx_i32 >> 7)[None, :]
    lo = (idx_i32 & 127)[None, :]
    seg = jax.lax.broadcasted_iota(jnp.int32, (S, tile), 0)
    oh = (seg == hi).astype(jnp.int8)
    cols = jax.lax.dot_general(
        tab, oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (128, tile) i32: selected entry - 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    ohl = (lane == lo).astype(jnp.int32)
    return jnp.sum(cols * ohl, axis=0) + 128


def _shade_kernel(ch_ref, dxz_ref, ndcy_ref, sky_ref, cam_ref,
                  tex_ref, hole_ref, cmap_ref, idx_ref, cov_ref, *,
                  S1, Sh, S2, tile, p11, n_rows):
    """Per-pixel fragment shading for classified portal channels.

    Pixels arrive flattened (H*W); all records' texel addressing reduced
    to cbase + ly*tsx + lx over the COMPACT texel table (see
    render/portal._pack_compact_cells), so the whole texel + colormap +
    transparency resolve is two _mxu_lookup stages -- no dense take.
    Formulas mirror render/portal._shade_portal (static.frag:24-26,
    sprite.frag:24-26); sky pixels take the precomputed per-env sky
    image (sky coords are row/column separable)."""
    # ch holds the classify kernel's 11-channel slice [KIND..HIGH]:
    # 0 kind | 1 p0 | 2 tsx | 3 tsy | 4 cbase | 5 light | 6 w | 7 t1 |
    # 8 t2 | 9 low | 10 high.
    ch = lambda c: ch_ref[0, c]
    kind = ch(0)
    covered0 = kind != 0.0
    is_sky = kind == 3.0
    is_wall = kind == 2.0
    is_decor = kind == 4.0
    wall_like = is_wall | is_decor
    cx = cam_ref[0, 0, 0]
    cy = cam_ref[0, 0, 1]
    cz = cam_ref[0, 0, 2]
    ndc_y = ndcy_ref[0, 0]
    dx = dxz_ref[0, 0]
    dz = dxz_ref[0, 1]

    plane_h = ch(1)  # p0 (flats)
    safe_ndc = jnp.where(jnp.abs(ndc_y) < 1e-9, 1e-9, ndc_y)
    t_flat = jnp.float32(p11) * (plane_h - cy) / safe_ndc
    flat_u = -(cx + dx * t_flat) * 100.0
    flat_v = -(cz + dz * t_flat) * 100.0
    h_at = cy + ndc_y * ch(6) / jnp.float32(p11)  # w
    dh = ch(10) - ch(9)  # high - low
    dh = jnp.where(dh == 0.0, 1.0, dh)
    wall_v = ch(7) + (ch(8) - ch(7)) * (h_at - ch(9)) / dh
    uu = jnp.where(wall_like, ch(1), flat_u)
    vv = jnp.where(wall_like, wall_v, flat_v)
    ts_x = jnp.where(ch(2) == 0.0, 1.0, ch(2))  # tsx
    ts_y = jnp.where(ch(3) == 0.0, 1.0, ch(3))  # tsy
    lx = jnp.floor(jnp.mod(uu, ts_x))
    ly = jnp.floor(jnp.mod(vv, ts_y))
    # Cells are stored with a +1 guard row/col (stride tsx+1): jnp.mod
    # may return exactly ts on f32 rounding edges and the atlas paths
    # then read the neighboring texel.
    lin = (ch(4) + ly * (ch(2) + 1.0) + lx).astype(jnp.int32)  # cbase
    lin = jnp.clip(lin, 0, S1 * 128 - 1)

    w_pix = jnp.where(wall_like | (is_sky & (ch(6) > 0.0)), ch(6), t_flat)
    light = ch(5)  # light
    dist_s = jnp.minimum(1.0, 1.0 - 0.9 / (w_pix + 0.9))
    dist_d = jnp.minimum(1.0, 1.0 - 1.0 / (w_pix + 1.0))
    lval = jnp.where(
        is_decor,
        jnp.minimum(light, light * 2.0 - dist_d),
        light * 2.0 - dist_s,
    )
    crow = jnp.clip(
        jnp.floor((1.0 - lval) * jnp.float32(n_rows)).astype(jnp.int32),
        0, n_rows - 1,
    )

    # Texel + colormap as exact int8 MXU lookups (2x the bf16 rate;
    # alphabet [0, 255]); the transparency flag cannot ride the s8
    # alphabet, so it comes from a packed-bit table 8x smaller (bf16
    # byte values, exact).
    v1 = _mxu_lookup_i8(lin, tex_ref[...], S1, tile)
    idx2 = crow * 256 + v1
    v2 = _mxu_lookup_i8(idx2, cmap_ref[...], S2, tile).astype(jnp.float32)
    hbyte = _mxu_lookup_i8(lin >> 3, hole_ref[...], Sh, tile)
    hole = ((hbyte >> (lin & 7)) & 1) == 1
    covered = covered0 & (is_sky | ~hole)
    val = jnp.where(is_sky, sky_ref[0, 0], v2)
    idx_ref[0, 0] = jnp.where(covered, val, 0.0)
    cov_ref[0, 0] = covered.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("p11", "n_rows", "tile", "interpret"),
)
def shade_portal_pallas(
    ch,  # (B, NCH, P) f32 classified channels, pixels flattened
    dxz,  # (B, 2, P) f32 per-pixel ray XZ direction
    ndc_y,  # (1, P) f32 (shared across envs)
    sky_img,  # (B, P) f32 colormapped sky palette values
    cam,  # (B, 3) f32 camera position
    tex_i8,  # (S1, 128) s8 compact texel table (texel - 128)
    hole_bytes,  # (Sh, 128) s8 packed transparency bits (byte - 128)
    cmap_i8,  # (64, 128) s8 colormap (value - 128)
    p11: float,
    n_rows: int,
    tile: int = 8192,
    interpret: bool = False,
):
    """(final palette index (B, P) f32, covered (B, P) f32)."""
    b, nch, p = ch.shape
    S1 = tex_i8.shape[0]
    Sh = hole_bytes.shape[0]
    S2 = cmap_i8.shape[0]
    pad_p = (-p) % tile
    if pad_p:
        ch = jnp.pad(ch, ((0, 0), (0, 0), (0, pad_p)))
        dxz = jnp.pad(dxz, ((0, 0), (0, 0), (0, pad_p)))
        ndc_y = jnp.pad(ndc_y, ((0, 0), (0, pad_p)), constant_values=1.0)
        sky_img = jnp.pad(sky_img, ((0, 0), (0, pad_p)))
    p_padded = p + pad_p
    cam3 = cam.reshape(b, 1, 3)
    # 2D (B, P) operands get a middle singleton: Mosaic requires the last
    # two block dims to divide (8, 128) or equal the array dims.
    ndc_y = ndc_y.reshape(1, 1, p_padded)
    sky_img = sky_img.reshape(b, 1, p_padded)

    kernel = functools.partial(
        _shade_kernel, S1=S1, Sh=Sh, S2=S2, tile=tile, p11=float(p11),
        n_rows=n_rows,
    )
    out_idx, out_cov = pl.pallas_call(
        kernel,
        grid=(b, p_padded // tile),
        in_specs=[
            pl.BlockSpec((1, nch, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sh, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, p_padded), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, p_padded), jnp.float32),
        ],
        interpret=interpret,
    )(ch, dxz, ndc_y, sky_img, cam3, tex_i8, hole_bytes, cmap_i8)
    return out_idx[:, 0, :p], out_cov[:, 0, :p]
