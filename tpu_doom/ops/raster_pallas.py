"""Pallas TPU kernel: K-layer depth peel for the software rasterizer.

Replaces the jnp renderer's dense (T, pixel-block) depth passes
(tpu_doom/render/raster_jnp.py layer_pass_block) with a fused kernel:
each program owns one pixel tile in VMEM, loops over triangle chunks with
no HBM intermediates (the flash-attention streaming pattern), and peels
cfg.depth_layers (z, id) layers with the same lexicographic (z, draw-order
id) tie rules as the reference GL depth test.

Per-triangle coefficient rows are precomputed on the XLA side
(`pack_triangle_rows`): lambda edge rows, z row divided by det (so the
kernel never divides), the barycentric-sum row, and a validity flag
(backface/degenerate culling folded in).

The kernel is pure VPU work: 5 broadcast FMA rows + compare/select chains
per (triangle, pixel); at T=240, P=64k, B=64, K=3 that is ~7e10 VPU ops.
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


def pack_triangle_rows(e, det, vz, vs):
    """(..., T, 3, 3), (..., T), (..., T, 3), (..., T, 3) ->
    (..., T, 16) f32 coefficient rows:
      [e00..e22, zr0..zr2, s0..s2, valid]."""
    safe_det = jnp.where(det == 0.0, 1.0, det)
    zr = vz / safe_det[..., None]
    valid = (det > 0.0).astype(jnp.float32)
    flat_e = e.reshape(*e.shape[:-2], 9)
    return jnp.concatenate([flat_e, zr, vs, valid[..., None]], axis=-1)


def _peel_kernel(tri_ref, grid_ref, z_ref, id_ref, *, n_layers, chunk_t, tile_p):
    """One pixel tile: stream triangle chunks, peel n_layers."""
    t_padded = tri_ref.shape[1]
    n_chunks = t_padded // chunk_t
    px = grid_ref[0:1, :]  # (1, tile_p)
    py = grid_ref[1:2, :]

    prev_z = jnp.full((1, tile_p), NEG_INF, jnp.float32)
    prev_id = jnp.full((1, tile_p), -1, jnp.int32)
    for layer in range(n_layers):
        best_z = jnp.full((1, tile_p), INF, jnp.float32)
        best_id = jnp.full((1, tile_p), BIG_ID, jnp.int32)
        for c in range(n_chunks):
            sub = tri_ref[0, pl.ds(c * chunk_t, chunk_t), :]  # (chunk_t, 16)
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
            ids = c * chunk_t + jax.lax.broadcasted_iota(
                jnp.int32, (chunk_t, tile_p), 0
            )
            after = (z > prev_z) | ((z == prev_z) & (ids > prev_id))
            zm = jnp.where(cover & after, z, INF)
            # Chunk-local lexicographic (z, id) min: argmin returns the first
            # (lowest-id) occurrence of the min, matching draw order.
            ci = jnp.argmin(zm, axis=0)[None, :]  # (1, tile_p)
            cz = jnp.min(zm, axis=0)[None, :]
            cid = c * chunk_t + ci
            better = (cz < best_z) | ((cz == best_z) & (cid < best_id) & (cz < INF))
            best_z = jnp.where(better, cz, best_z)
            best_id = jnp.where(better, cid, best_id)
        z_ref[0, layer, :] = best_z[0]
        id_ref[0, layer, :] = best_id[0]
        prev_z, prev_id = best_z, best_id


@functools.partial(
    jax.jit, static_argnames=("n_layers", "tile_p", "chunk_t", "interpret")
)
def depth_peel_pallas(
    tri_rows,  # (B, T, 16) from pack_triangle_rows
    grid,  # (3, P) pixel homogeneous coords
    n_layers: int,
    tile_p: int = 512,
    chunk_t: int = 128,
    interpret: bool = False,
):
    """(B, T, 16), (3, P) -> (z (B, K, P) f32, id (B, K, P) i32).

    id == BIG_ID means no triangle covers the pixel at that layer."""
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
            pl.BlockSpec(
                (1, t_padded, 16), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, tile_p), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n_layers, tile_p), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_layers, tile_p), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_layers, p_padded), jnp.float32),
            jax.ShapeDtypeStruct((b, n_layers, p_padded), jnp.int32),
        ],
        interpret=interpret,
    )(tri_rows, grid)
    return z[..., :p], ids[..., :p]
