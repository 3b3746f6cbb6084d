"""Pallas kernel tests: the TPU depth-peel kernel must reproduce the jnp
reference path exactly (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.ops.raster_pallas import (
    BIG_ID,
    depth_peel_pallas,
    pack_triangle_rows,
)
from tpu_doom.render.raster_jnp import (
    _peel_layers_jnp,
    _pixel_grid,
    _prepare_env,
    render_frames,
)
from tpu_doom.sim import initial_state, scene_from_arrays
from tpu_doom.utils.config import GameConfig


@pytest.fixture(scope="module")
def rsim(archive, textures, metadata):
    from tpu_doom.geom.builder import compile_level

    arrays = compile_level(archive, textures, metadata, 0)
    scene, num_objects = scene_from_arrays(arrays)
    return arrays, scene, num_objects


class TestDepthPeelKernel:
    def test_matches_jnp_on_level(self, rsim):
        """Real level geometry from two camera poses: the kernel's (z, id)
        layers equal the jnp dense peel."""
        arrays, scene, num_objects = rsim
        cfg = GameConfig()
        W, H = 96, 64
        state = initial_state(scene, num_objects, 2)
        state = state._replace(
            pos=jnp.array([[-2.56, 0.33, -2.24], [-2.0, 0.2, -8.5]]),
            yaw=jnp.array([0.0, 1.3]),
        )
        grid = _pixel_grid(W, H)
        prep = jax.vmap(
            lambda pos, yaw, pitch, off, t: _prepare_env(
                scene, cfg, W, H, pos, yaw, pitch, off, t
            )
        )(state.pos, state.yaw, state.pitch, state.object_offset, state.time)

        K = 3
        zj, ij = jax.vmap(lambda p: _peel_layers_jnp(p, grid, K))(prep)
        rows = pack_triangle_rows(prep["e"], prep["det"], prep["vz"], prep["vs"])
        zp, ip = depth_peel_pallas(
            rows, grid, K, tile_p=256, chunk_t=64, interpret=True
        )
        ij = np.asarray(ij)
        ip = np.asarray(ip)
        assert (ij == ip).all(), f"id mismatch: {(ij != ip).mean():.4f}"
        zj = np.asarray(zj)
        zp = np.asarray(zp)
        finite = np.isfinite(zj)
        assert (np.isfinite(zp) == finite).all()
        np.testing.assert_allclose(zp[finite], zj[finite], rtol=0, atol=2e-5)

    def test_full_render_backends_equal(self, rsim):
        """End-to-end frames: pallas-interpret backend == jnp backend."""
        arrays, scene, num_objects = rsim

        cfg_j = GameConfig(raster_backend="jnp")
        cfg_p = GameConfig(raster_backend="pallas_interpret")
        state = initial_state(scene, num_objects, 1)
        state = state._replace(pos=jnp.array([[-2.2, 0.3, -8.8]]), yaw=jnp.array([0.8]))
        idx_j, cov_j = render_frames(scene, cfg_j, state, 96, 64)
        idx_p, cov_p = render_frames(scene, cfg_p, state, 96, 64)
        np.testing.assert_array_equal(np.asarray(cov_j), np.asarray(cov_p))
        same = (np.asarray(idx_j) == np.asarray(idx_p)).mean()
        assert same == 1.0, f"frames differ: {1 - same:.5f}"

    def test_empty_pixels_get_big_id(self, rsim):
        arrays, scene, num_objects = rsim
        cfg = GameConfig()
        W, H = 32, 32
        state = initial_state(scene, num_objects, 1)
        # Outside the map looking away: nothing covers most pixels.
        state = state._replace(pos=jnp.array([[50.0, 0.0, 50.0]]))
        grid = _pixel_grid(W, H)
        prep = jax.vmap(
            lambda pos, yaw, pitch, off, t: _prepare_env(
                scene, cfg, W, H, pos, yaw, pitch, off, t
            )
        )(state.pos, state.yaw, state.pitch, state.object_offset, state.time)
        rows = pack_triangle_rows(prep["e"], prep["det"], prep["vz"], prep["vs"])
        zp, ip = depth_peel_pallas(rows, grid, 1, tile_p=256, chunk_t=64, interpret=True)
        empty = ~np.isfinite(np.asarray(zp))
        assert empty.any()
        assert (np.asarray(ip)[empty] == BIG_ID).all()


class TestClassifyKernel:
    def test_classify_matches_jnp_on_real_walk(self, rsim):
        """Portal record classification: Pallas (interpret) == jnp loop on
        records produced by the real column walk."""
        from tpu_doom.geom.builder import compile_level  # noqa: F401
        from tpu_doom.models import DoomSim
        from tpu_doom.ops.raster_pallas import classify_alpha_pallas
        from tpu_doom.render.portal import _classify_jnp, _walk_env
        from tpu_doom.render.portal import portal_scene_from_table

        sim = DoomSim(
            GameConfig(wad_file=":test:", width=64, height=32, batch_size=2,
                       raster_backend="portal_jnp", portal_crossings=10)
        )
        pscene = portal_scene_from_table(sim.arrays.portal, sim.arrays)
        state = sim.reset(2)
        state = state._replace(
            pos=jnp.array([[-2.56, 0.5, -2.24], [-2.2, 0.2, -8.8]]),
            yaw=jnp.array([0.0, 0.9]),
            time=jnp.array([0.0, 1.25]),
        )
        from tpu_doom.render.portal import _alpha_mask_env
        import math

        records, words, _ = jax.vmap(
            lambda pos, yaw, pitch, off, t: _walk_env(
                pscene, sim.scene, sim.config, 64, 32, 10,
                pos, yaw, pitch, off, t,
            )
        )(state.pos, state.yaw, state.pitch, state.object_offset, state.time)
        cam_y = state.pos[:, 1] + sim.config.player.camera_height
        p11 = 1.0 / math.tan(math.radians(sim.config.fov) / 2)
        hc = pscene["alpha_meta"][0]
        # Kernel computes the masked alpha test in-register from the
        # packed words; the jnp oracle goes through the dense mask.
        ch_k = classify_alpha_pallas(
            records, words, cam_y, hc, 32, p11, interpret=True
        )
        mask = jax.vmap(
            lambda r, w, cy: _alpha_mask_env(r, w, 32, cy, p11, hc)
        )(records, words, cam_y)
        ch_j = jax.vmap(lambda r, m: _classify_jnp(r, m, 32))(records, mask)
        # Kernel outputs the contiguous [KIND..HIGH] channel slice only.
        from tpu_doom.render.portal import KERNEL_CH0, KERNEL_NCH

        np.testing.assert_array_equal(
            np.asarray(ch_k),
            np.asarray(ch_j)[:, KERNEL_CH0 : KERNEL_CH0 + KERNEL_NCH],
        )

    def test_classify_empty_records(self):
        from tpu_doom.ops.raster_pallas import classify_alpha_pallas

        # All-empty spans -> kind channel all zero. 10 records = 2
        # crossings x 5 families.
        rec = np.zeros((1, 10, 16, 40), np.float32)
        rec[:, :, 0, :] = 1e9
        rec[:, :, 1, :] = -1e9
        words = jnp.zeros((1, 2, 4, 40), jnp.int32)
        ch = classify_alpha_pallas(
            jnp.asarray(rec), words, jnp.zeros((1,)), 128, 32, 1.07,
            interpret=True,
        )
        assert ch.shape == (1, 11, 32, 40)
        assert (np.asarray(ch) == 0).all()


class TestShadeKernel:
    def test_full_kernel_path_matches_jnp(self, rsim):
        """End-to-end portal render: the kernel path (classify_alpha +
        shade_portal, interpret mode) must match the pure-jnp path
        pixel-exactly (same formulas, compact table == atlas texels)."""
        from tpu_doom.models import DoomSim

        frames = {}
        for be in ("portal_jnp", "portal_interpret"):
            sim = DoomSim(
                GameConfig(wad_file=":test:", width=64, height=40,
                           batch_size=2, raster_backend=be,
                           portal_crossings=10)
            )
            state = sim.reset(2)
            state = state._replace(
                pos=jnp.array([[-2.56, 0.5, -2.24], [-2.2, 0.2, -8.8]]),
                yaw=jnp.array([0.3, 0.9]),
                time=jnp.array([0.0, 1.25]),
            )
            idx, cov = sim.render(state)
            frames[be] = (np.asarray(idx), np.asarray(cov))
        a, ca = frames["portal_jnp"]
        b, cb = frames["portal_interpret"]
        np.testing.assert_array_equal(ca, cb)
        np.testing.assert_array_equal(a, b)


class TestSelectRowsKernel:
    """ops.raster_pallas.select_rows_pallas / scatter_live_pallas: the
    walk's attribute selection without the HBM one-hot (render/portal.py
    _walk_env select-kernel path)."""

    def test_select_exact_f32(self):
        from tpu_doom.ops.raster_pallas import (
            select_rows_pallas,
            split3_bf16,
        )

        rng = np.random.default_rng(0)
        S, C, N = 640, 74, 768
        tab = (
            rng.standard_normal((S, C))
            * np.exp(rng.uniform(-20, 20, (S, C)))
        ).astype(np.float32)
        # Hard cases: >16-bit ints (cbase offsets) and non-dyadic
        # fractions (u8/255 light values) must survive the 3-way bf16
        # split BIT-EXACTLY.
        tab[:5, :5] = [[0.0, 1.0, 65537.0, 8388609.0, 1.0 / 255.0]] * 5
        idx = rng.integers(0, S, N).astype(np.int32)
        tab3 = split3_bf16(jnp.asarray(tab))
        assert np.array_equal(
            np.asarray(tab3.astype(jnp.float32).sum(0)), tab
        )
        out = np.asarray(
            select_rows_pallas(jnp.asarray(idx), tab3, interpret=True)
        )
        np.testing.assert_array_equal(out, tab[idx].T)

    def test_split3_exact_under_jit(self):
        """split3_bf16 INSIDE a jit must still produce three genuine
        planes. The original cast-based split (x - f32(bf16(x))) was
        exact eagerly but collapsed under jit: XLA's simplifier elides
        f32->bf16->f32 convert pairs as excess-precision no-ops, making
        mid/lo identically zero -- the stored bf16 hi plane then carries
        plain bf16 ROUNDING. That elision was invisible to every eager
        test and caused a real 27k-px hardware mismatch on the
        :texstress: verify leg (select-kernel walk path). The fix
        computes the rounding with lax.reduce_precision, which the
        simplifier keeps."""
        from tpu_doom.ops.raster_pallas import split3_bf16

        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.standard_normal(4096).astype(np.float32) * 1e3)

        @jax.jit
        def f(x):
            t = split3_bf16(x)
            return t, t.astype(jnp.float32).sum(0)

        t, s = f(x)
        # The mid plane must be genuinely nonzero for generic values --
        # an elided round-trip zeroes it (and sum-exactness alone would
        # NOT catch that in f32; the loss appears only at bf16 storage).
        assert int((np.asarray(t[1].astype(jnp.float32)) != 0).sum()) > 3000
        np.testing.assert_array_equal(np.asarray(s), np.asarray(x))
        # Structural pin: whether XLA fires the elision depends on the
        # surrounding graph (the CPU test env happens not to, the TPU
        # production graph did), so behavior alone cannot guard the
        # revert. The lowered IR must carry real reduce_precision ops,
        # not bf16 convert round-trips.
        ir = jax.jit(split3_bf16).lower(x).as_text()
        assert "reduce_precision" in ir, "split3_bf16 must use lax.reduce_precision (convert pairs get elided)"

    def test_select_vmapped(self):
        from tpu_doom.ops.raster_pallas import (
            select_rows_pallas,
            split3_bf16,
        )

        rng = np.random.default_rng(1)
        S, C, N, B = 256, 30, 384, 4
        tabs = rng.standard_normal((B, S, C)).astype(np.float32) * 1e4
        idxb = rng.integers(0, S, (B, N)).astype(np.int32)
        tab3b = jax.vmap(split3_bf16)(jnp.asarray(tabs))
        outb = np.asarray(
            jax.vmap(lambda i, t: select_rows_pallas(i, t, interpret=True))(
                jnp.asarray(idxb), tab3b
            )
        )
        refb = np.stack([tabs[b][idxb[b]].T for b in range(B)])
        np.testing.assert_array_equal(outb, refb)

    def test_scatter_live(self):
        from tpu_doom.ops.raster_pallas import scatter_live_pallas

        rng = np.random.default_rng(2)
        S, N = 640, 768
        idx = rng.integers(0, S, N).astype(np.int32)
        live = (rng.random(N) < 0.3).astype(np.float32)
        cnt = np.asarray(
            scatter_live_pallas(jnp.asarray(idx), jnp.asarray(live), S,
                                interpret=True)
        )
        ref = np.zeros(S, np.float32)
        np.add.at(ref, idx, live)
        # Integer-valued masses accumulate exactly in f32.
        np.testing.assert_array_equal(cnt, ref)
