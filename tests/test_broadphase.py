"""Collision broad-phase: the XZ-grid culled sweep must be trajectory-
identical to the brute-force all-triangles sweep."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.geom.broadphase import build_grid
from tpu_doom.sim import initial_state, null_actions, scene_from_arrays
from tpu_doom.sim.step import step as sim_step
from tpu_doom.utils.config import GameConfig, PlayerConfig


@pytest.fixture(scope="module")
def arrays(archive, textures, metadata):
    from tpu_doom.geom.builder import compile_level

    return compile_level(archive, textures, metadata, 0)


class TestGrid:
    def test_every_triangle_binned(self, arrays):
        origin, inv_cell, nx, nz, cells = build_grid(
            arrays.coll_v0, arrays.coll_v1, arrays.coll_v2
        )
        binned = set(int(i) for i in cells.ravel() if i >= 0)
        assert binned == set(range(len(arrays.coll_v0)))

    def test_cell_lookup_contains_nearby(self, arrays):
        """Every triangle is listed in the cell of each of its vertices."""
        origin, inv_cell, nx, nz, cells = build_grid(
            arrays.coll_v0, arrays.coll_v1, arrays.coll_v2
        )
        for t in range(0, len(arrays.coll_v0), 7):
            for v in (arrays.coll_v0[t], arrays.coll_v2[t]):
                cx = min(max(int((v[0] - origin[0]) * inv_cell), 0), nx - 1)
                cz = min(max(int((v[2] - origin[1]) * inv_cell), 0), nz - 1)
                assert t in cells[cx * nz + cz], t


class TestTrajectoryEquality:
    def test_brute_vs_broadphase(self, arrays):
        scene, num_objects = scene_from_arrays(arrays)
        mk = lambda bp: GameConfig(
            batch_size=2,
            player=PlayerConfig(
                clip_substeps=2, enable_noclip=False,
                collision_broadphase=bp,
                # "legacy" = per-env sweep_sphere for BOTH configs, so this
                # isolates the grid culling (the move-kernel backends have
                # their own equality test, tests/test_collision_kernel.py).
                collision_backend="legacy",
            ),
        )
        cfg_b = mk(True)
        cfg_f = mk(False)
        jb = jax.jit(lambda s, a: sim_step(scene, cfg_b, s, a))
        jf = jax.jit(lambda s, a: sim_step(scene, cfg_f, s, a))
        # Walk a jagged path (forward + strafe + turning) through the level.
        acts = null_actions(2)._replace(
            movement=jnp.array([[0.4, -1.0], [-0.3, -1.0]]),
            look=jnp.array([[0.01, 0.0], [-0.02, 0.001]]),
            jump=jnp.array([False, True]),
        )
        sb = sf = initial_state(scene, num_objects, 2)
        for _ in range(150):
            sb = jb(sb, acts)
            sf = jf(sf, acts)
        np.testing.assert_array_equal(np.asarray(sb.pos), np.asarray(sf.pos))
        np.testing.assert_array_equal(np.asarray(sb.vel), np.asarray(sf.vel))
