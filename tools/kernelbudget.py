#!/usr/bin/env python3
"""Ablation budget for the fused classify+shade kernel at the driver
bench point: times an instrumented COPY of _render_fused_kernel with
stages disabled one at a time, against the production kernel as the
baseline sanity check.

Usage: python tools/kernelbudget.py [variant ...]
Variants: prod full no_classify no_tex no_hole no_cmap no_lookups
          no_flatten no_shade_math
(default: all). Env: BENCH_BATCH/W/H/REPS, CFG= overrides as perfcmp.

The copy exists for measurement only -- numbers are meaningful relative
to its own `full` variant; `prod` cross-checks that the copy tracks the
real kernel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.ravel()[0:1])


def _ablated_kernel(rec_ref, words_ref, scal_ref, bounds_ref, dxz_ref,
                    sky_ref, tex_ref, hole_ref, cmap_ref,
                    idx_ref, cov_ref, ch_ref, flat_ref, *, n_rec, tile_h,
                    w, masked_family, rpc, n_words, height, p11, n_rows,
                    S1, Sh, S2, holeless, ablate):
    """Measurement copy of ops.raster_pallas._render_fused_kernel
    (global-table, non-per-env variant) with `ablate` stage switches."""
    from tpu_doom.ops.raster_pallas import _mxu_lookup, _mxu_lookup_i8

    j = pl.program_id(1)
    y = (
        jnp.float32(j * tile_h)
        + jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0).astype(jnp.float32)
        + 0.5
    )
    tile_min = jnp.float32(j * tile_h) + 0.5
    tile_max = jnp.float32(j * tile_h + tile_h) - 0.5
    cam_x = scal_ref[0, 0, 0]
    cam_y = scal_ref[0, 0, 1]
    cam_z = scal_ref[0, 0, 2]
    hc = scal_ref[0, 0, 3].astype(jnp.int32)
    shear = scal_ref[0, 0, 4]
    ndc_y = 1.0 - 2.0 * y / jnp.float32(height) + shear

    ch_ref[...] = jnp.zeros((11, tile_h, w), jnp.float32)
    if "classify" not in ablate:
        for k in range(n_rec // rpc):
            overlap = (bounds_ref[0, k, 0] <= tile_max) & (
                bounds_ref[0, k, 1] >= tile_min
            )
            not_done = jnp.min(ch_ref[0]) == 0.0

            @pl.when(overlap & not_done)
            def _(k=k):
                out = ch_ref[...]
                done = out[0] != 0.0
                for fam in range(rpc):
                    rec = rec_ref[0, k * rpc + fam]
                    y0 = rec[0, :][None, :]
                    y1 = rec[1, :][None, :]
                    hit = ~done & (y >= y0) & (y < y1)
                    if fam == masked_family and "alpha" not in ablate:
                        w_ch = rec[8, :][None, :]
                        low = rec[11, :][None, :]
                        high = rec[12, :][None, :]
                        t1 = rec[9, :][None, :]
                        t2 = rec[10, :][None, :]
                        tsy = rec[5, :][None, :]
                        ay = rec[15, :][None, :]
                        masked = rec[13, :][None, :] > 0.5
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
                    out = jnp.where(hit[None], rec_out[:, None, :], out)
                    done = done | hit
                ch_ref[...] = out

    ch = lambda c: ch_ref[c]
    kind = ch(0)
    covered0 = kind != 0.0
    is_sky = kind == 3.0
    is_wall = kind == 2.0
    is_decor = kind == 4.0
    wall_like = is_wall | is_decor
    dx = dxz_ref[0, 0][None, :]
    dz = dxz_ref[0, 1][None, :]

    if "shade_math" in ablate:
        lin = (ch(4)).astype(jnp.int32)
        lin = jnp.clip(lin, 0, S1 * 128 - 1)
        crow = jnp.clip(ch(5).astype(jnp.int32), 0, n_rows - 1)
    else:
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

    tile = tile_h * w
    if "flatten" in ablate:
        lin_f = jax.lax.broadcasted_iota(jnp.int32, (tile,), 0) % (S1 * 128)
        crow_f = jax.lax.broadcasted_iota(jnp.int32, (tile,), 0) % n_rows
        # keep a data dependency so lin/crow aren't dead code
        lin_f = lin_f + jnp.sum(lin[0:1, 0:1]).astype(jnp.int32) * 0
        crow_f = crow_f + jnp.sum(crow[0:1, 0:1]).astype(jnp.int32) * 0
    else:
        for r in range(tile_h):
            flat_ref[0, pl.ds(r * w, w)] = lin[r]
            flat_ref[1, pl.ds(r * w, w)] = crow[r]
        lin_f = flat_ref[0]
        crow_f = flat_ref[1]

    if "tex" in ablate:
        v1 = jnp.full((tile,), 128, jnp.int32) + lin_f * 0
    else:
        v1 = _mxu_lookup_i8(lin_f, tex_ref[...], S1, tile)
    if holeless or "hole" in ablate:
        hole_f = jnp.zeros((tile,), jnp.bool_)
    else:
        hbyte = _mxu_lookup_i8(lin_f >> 3, hole_ref[...], Sh, tile)
        hole_f = ((hbyte >> (lin_f & 7)) & 1) == 1
    if "cmap" in ablate:
        v2 = v1.astype(jnp.float32) + crow_f.astype(jnp.float32) * 0
    else:
        idx2 = crow_f * 256 + v1
        v2 = _mxu_lookup_i8(idx2, cmap_ref[...], S2, tile).astype(jnp.float32)
    for r in range(tile_h):
        covered = covered0[r] & (is_sky[r] | ~hole_f[r * w:(r + 1) * w])
        val = jnp.where(is_sky[r], sky_ref[0, r], v2[r * w:(r + 1) * w])
        idx_ref[0, r, :] = jnp.where(covered, val, 0.0)
        cov_ref[0, r, :] = covered.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("height", "p11", "n_rows", "tile_h", "masked_family",
                     "rpc", "holeless", "ablate"),
)
def _ablated_call(records, words, cam, hc, dxz, sky_img, tex_i8,
                  hole_bytes, cmap_i8, height, p11, n_rows, tile_h,
                  masked_family=3, rpc=5, holeless=False, ablate=()):
    b, n_rec, nch, w = records.shape
    n_words = words.shape[2]
    S1 = tex_i8.shape[0]
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
    n_k = n_rec // rpc
    bounds = jnp.stack(
        [jnp.min(records[:, :, 0, :], axis=-1).reshape(b, n_k, rpc).min(-1),
         jnp.max(records[:, :, 1, :], axis=-1).reshape(b, n_k, rpc).max(-1)],
        axis=-1,
    )
    hcb = jnp.broadcast_to(jnp.asarray(hc, jnp.float32).reshape(-1), (b,))
    scal = jnp.concatenate(
        [jnp.asarray(cam, jnp.float32), hcb[:, None],
         jnp.zeros((b, 1), jnp.float32)],
        axis=-1,
    ).reshape(b, 1, 5)
    kernel = functools.partial(
        _ablated_kernel, n_rec=n_rec, tile_h=tile_h, w=w_padded,
        masked_family=masked_family, rpc=rpc, n_words=n_words,
        height=height, p11=float(p11), n_rows=n_rows, S1=S1, Sh=Sh, S2=S2,
        holeless=holeless, ablate=frozenset(ablate),
    )
    out_idx, out_cov = pl.pallas_call(
        kernel,
        grid=(b, h_padded // tile_h),
        in_specs=[
            pl.BlockSpec((1, n_rec, nch, w_padded), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, words.shape[1], n_words, w_padded),
                         lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 5), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_k, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, w_padded), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w_padded), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sh, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
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
        ],
    )(records, words, scal, bounds, dxz, sky_img, tex_i8, hole_bytes,
      cmap_i8)
    return out_idx[:, :height, :w], out_cov[:, :height, :w]


def main():
    import math

    from tpu_doom.models import DoomSim
    from tpu_doom.render.portal import _sky_image, _walk_env
    from tpu_doom.ops.raster_pallas import render_portal_fused_pallas
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    variants = sys.argv[1:] or [
        "prod", "full", "no_classify", "no_alpha", "no_tex", "no_hole",
        "no_cmap", "no_lookups", "no_flatten", "no_shade_math",
    ]
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    width = int(os.environ.get("BENCH_W", "320"))
    height = int(os.environ.get("BENCH_H", "200"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    env_chunk = 8

    cfg = GameConfig(
        wad_file=":test:", width=width, height=height, batch_size=batch,
        raster_backend="portal", player=PlayerConfig(clip_substeps=4),
    )
    sim = DoomSim(cfg)
    scene, pscene = sim.scene, sim._get_portal_scene()
    state = sim.reset(batch)
    rng = np.random.default_rng(0)
    state = state._replace(
        yaw=jnp.asarray(rng.uniform(0, 6.28, batch).astype(np.float32)))
    n_cross = int(cfg.portal_crossings)
    p11 = 1.0 / math.tan(math.radians(cfg.fov) / 2.0)
    hc = pscene["alpha_meta"][0]
    n_rows = scene.palette_lut.shape[0]
    holeless = "hole_bytes" not in pscene
    hole_tab = (jnp.full((1, 128), -128, jnp.int8) if holeless
                else pscene["hole_bytes"])
    tile_h = 40 if height % 40 == 0 else 32

    @jax.jit
    def walk_all(s):
        return jax.vmap(
            lambda p, y, pi, o, t: _walk_env(
                pscene, scene, cfg, width, height, n_cross, p, y, pi, o, t)
        )(s.pos, s.yaw, s.pitch, s.object_offset, s.time)

    records, words, aux = walk_all(state)
    _sync(records)
    sky_img = jax.jit(jax.vmap(
        lambda sy, cy, sp, cp: _sky_image(
            pscene, scene, cfg, width, height, sy, cy, sp, cp)
    ))(aux["sy"], aux["cy"], aux["sp"], aux["cp"])
    dxz = aux["d"].transpose(0, 2, 1)
    _sync(sky_img)

    ABL = dict(
        full=(), no_classify=("classify",), no_alpha=("alpha",),
        no_tex=("tex",), no_hole=("hole",), no_cmap=("cmap",),
        no_lookups=("tex", "hole", "cmap"), no_flatten=("flatten",),
        no_shade_math=("shade_math",),
    )

    def call_prod(r8, w8, cam8, dxz8, sky8):
        return render_portal_fused_pallas(
            r8, w8, cam8, hc, dxz8, sky8, pscene["tex_i8"], hole_tab,
            pscene["cmap_i8"], height, p11, n_rows, tile_h=tile_h,
            holeless=holeless, shear=None,
        )

    def call_abl(ablate):
        def f(r8, w8, cam8, dxz8, sky8):
            return _ablated_call(
                r8, w8, cam8, hc, dxz8, sky8, pscene["tex_i8"], hole_tab,
                pscene["cmap_i8"], height, p11, n_rows, tile_h,
                holeless=holeless, ablate=ablate,
            )
        return f

    for name in variants:
        fn = call_prod if name == "prod" else call_abl(ABL[name])

        # Chain chunks with a data dependency (records += 0*check) so
        # repeated calls cannot be CSE'd; mirrors bench env-chunking.
        @jax.jit
        def many(records, words, cam, dxz, sky, check, fn=fn):
            for c in range(batch // env_chunk):
                sl = slice(c * env_chunk, (c + 1) * env_chunk)
                r8 = records[sl] + check * 0.0
                idx, cov = fn(r8, words[sl], cam[sl], dxz[sl], sky[sl])
                check = check + jnp.sum(idx, dtype=jnp.float32)
            return check

        check = jnp.float32(0.0)
        check = many(records, words, aux["cam"], dxz, sky_img, check)
        _sync(check)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            check = many(records, words, aux["cam"], dxz, sky_img, check)
            _sync(check)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>14}: {best * 1000:8.2f} ms/batch (B={batch})",
              flush=True)


if __name__ == "__main__":
    main()
