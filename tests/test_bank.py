"""Mixed-level batch tests: the LevelBank (SURVEY.md section 7.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.models.level_bank import LevelBank, pad_level_arrays
from tpu_doom.sim.state import null_actions
from tpu_doom.utils.config import GameConfig, PlayerConfig


@pytest.fixture(scope="module")
def bank(archive, textures, metadata):
    from tpu_doom.geom.builder import compile_level

    cfg = GameConfig(
        wad_file=":test:",
        width=64,
        height=40,
        player=PlayerConfig(clip_substeps=1, enable_noclip=False),
    )
    levels = [compile_level(archive, textures, metadata, i) for i in range(2)]
    return LevelBank(levels, cfg), levels


def _stack_actions(acts, n_levels):
    return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *([acts] * n_levels))


class TestPadding:
    def test_padded_shapes_match(self, bank):
        _, levels = bank
        padded = pad_level_arrays(levels)
        for name in ("static_pos", "coll_v0", "trig_origin", "wall_tris"):
            shapes = {getattr(p, name).shape for p in padded}
            assert len(shapes) == 1, name

    def test_padding_is_inert(self, bank):
        """The level with fewer triangles must behave identically padded
        vs standalone: step a few ticks and compare player positions."""
        b, levels = bank
        from tpu_doom.sim import scene_from_arrays, initial_state
        from tpu_doom.sim.step import step as sim_step

        # Standalone E1M2 (unpadded).
        scene2, no2 = scene_from_arrays(levels[1])
        cfg = b.cfg
        s_alone = initial_state(scene2, no2, 2)
        acts = null_actions(2)._replace(
            movement=jnp.tile(jnp.array([[0.4, -1.0]]), (2, 1))
        )
        # Bank (padded) state for level 1.
        s_bank = b.reset(2)
        bank_acts = _stack_actions(acts, 2)
        jalone = jax.jit(lambda s, a: sim_step(scene2, cfg, s, a))
        jbank = jax.jit(b.step)
        for _ in range(30):
            s_alone = jalone(s_alone, acts)
            s_bank = jbank(s_bank, bank_acts)
        np.testing.assert_allclose(
            np.asarray(s_alone.pos), np.asarray(s_bank.pos[1]), atol=1e-5
        )

    def test_render_bank(self, bank):
        b, _ = bank
        state = b.reset(2)
        idx, cov = b.render(state)
        assert idx.shape == (2, 2, 40, 64)
        assert np.asarray(cov).all()
        # The two levels render different frames.
        assert (np.asarray(idx[0, 0]) != np.asarray(idx[1, 0])).any()

    def test_stairs_climbing_e1m2(self, bank):
        """The PD hover spring climbs the 16-unit steps (ref
        player.rs:302-305), reaching the upper room's floor at 0.48."""
        b, _ = bank
        state = b.reset(2)
        acts = null_actions(2)._replace(
            movement=jnp.tile(jnp.array([[0.0, -1.0]]), (2, 1))
        )
        bank_acts = _stack_actions(acts, 2)
        jstep = jax.jit(b.step)
        for _ in range(240):
            state = jstep(state, bank_acts)
        # Level 1 env: through the stairs (z < -6.4) on the upper floor.
        assert float(state.pos[1, 0, 2]) < -6.4
        assert float(state.pos[1, 0, 1]) == pytest.approx(0.48 + 0.325, abs=0.03)

    def test_gun_door_in_e1m2(self, bank):
        """Shoot the gun door (special 46) in the bank's level 1."""
        b, _ = bank
        state = b.reset(2)
        # Teleport level-1 players in front of the gun door (wad x 1088,
        # y 192..320 -> game z = -10.88, x in [-3.2, -1.92]) on floor 0.48.
        state = state._replace(
            pos=state.pos.at[1, :, :].set(jnp.array([-2.56, 1.0, -10.0]))
        )
        acts = null_actions(2)._replace(shoot=jnp.array([True, True]))
        bank_acts = _stack_actions(acts, 2)
        state = jax.jit(b.step)(state, bank_acts)
        # Gun door is object 1 of level 1; a shot opens it (first offset
        # = LowestCeiling(224) - 4 - 48 = 1.72).
        assert bool(state.eff_active[1, 0, 1])
        assert float(state.eff_first[1, 0, 1]) == pytest.approx(1.72, abs=1e-4)
        # Level 0 envs unaffected.
        assert not bool(state.eff_active[0, 0, 1])


class TestScenesAsArgs:
    def test_explicit_scenes_match_closed_over(self, bank):
        """step/render with scenes/pscenes passed as (traced) arguments
        must equal the closed-over default -- the argument form is what
        jitted callers use so stacked atlases don't embed as HLO
        constants (the L=8 bank bench exceeded the remote-compile
        transport limit without it)."""
        import jax

        b, levels = bank
        state = b.reset(2)
        acts = _stack_actions(null_actions(2), 2)
        s_def = b.step(state, acts)
        s_arg = jax.jit(
            lambda scenes, st, a: b.step(st, a, scenes=scenes)
        )(b.scenes, state, acts)
        for name in state._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(s_def, name)),
                np.asarray(getattr(s_arg, name)), err_msg=name)
        i_def, c_def = b.render(state, 32, 24)
        i_arg, c_arg = jax.jit(
            lambda scenes, pscenes, st: b.render(
                st, 32, 24, scenes=scenes, pscenes=pscenes)
        )(b.scenes, b.pscenes, state)
        np.testing.assert_array_equal(np.asarray(i_def), np.asarray(i_arg))
        np.testing.assert_array_equal(np.asarray(c_def), np.asarray(c_arg))


class TestBankPortal:
    def test_bank_portal_matches_standalone(self, archive, textures, metadata):
        """Bank render on the portal backend == each level rendered
        standalone through the same backend (padding is inert)."""
        from tpu_doom.geom.builder import compile_level
        from tpu_doom.models import DoomSim
        from tpu_doom.models.level_bank import LevelBank

        cfg = GameConfig(
            wad_file=":test:", width=48, height=32,
            raster_backend="portal_jnp", portal_crossings=10,
            player=PlayerConfig(clip_substeps=1, enable_noclip=False),
        )
        levels = [compile_level(archive, textures, metadata, i) for i in range(2)]
        b = LevelBank(levels, cfg)
        state = b.reset(2)
        idx, cov = b.render(state)
        assert idx.shape == (2, 2, 32, 48)
        for li in range(2):
            sim = DoomSim(
                GameConfig(
                    wad_file=":test:", width=48, height=32,
                    raster_backend="portal_jnp", portal_crossings=10,
                    initial_level_index=li,
                    player=PlayerConfig(clip_substeps=1, enable_noclip=False),
                )
            )
            solo = sim.reset(2)
            i1, c1 = sim.render(solo)
            np.testing.assert_array_equal(np.asarray(idx[li]), np.asarray(i1))
            np.testing.assert_array_equal(np.asarray(cov[li]), np.asarray(c1))


class TestPerEnvExits:
    def test_exit_migrates_env_to_next_level(self, bank):
        """Env (0,0) hits E1M1's exit switch and respawns at E1M2's start
        in a free slot of level 1's group; env (0,1) keeps playing
        untouched (ref level.rs:194-199; VERDICT r1 item 5)."""
        b, levels = bank
        state = b.reset(2)
        active = jnp.array([[True, True], [False, False]])
        # Put env (0,0) at the exit switch; env (0,1) stays elsewhere.
        state = state._replace(
            pos=state.pos.at[0, 0].set(jnp.array([-2.56, 0.68, -14.7]))
        )
        acts = null_actions(2)._replace(push=jnp.array([True, False]))
        bank_acts = _stack_actions(acts, 2)
        step_fn = jax.jit(b.step_with_exits)
        state1, active1, moved = step_fn(state, active, bank_acts)
        # Env left level 0 slot 0...
        assert bool(moved[0, 0]) and not bool(moved[0, 1])
        assert not bool(active1[0, 0])
        # ...and occupies exactly one slot of level 1, at E1M2's start.
        assert int(np.asarray(active1[1]).sum()) == 1
        slot = int(np.argmax(np.asarray(active1[1])))
        np.testing.assert_allclose(
            np.asarray(state1.pos[1, slot]),
            np.asarray(b.initial_states(2).pos[1, slot]),
            atol=1e-6,
        )
        assert float(state1.time[1, slot]) == 0.0  # time reset (ref)
        # Env (0,1) kept playing: still active, tick advanced, not reset.
        assert bool(active1[0, 1])
        assert int(state1.tick[0, 1]) == int(state.tick[0, 1]) + 1
        # All exit flags cleared.
        assert not np.asarray(state1.exit_triggered).any()

    def test_exit_capacity_fallback_resets_in_place(self, bank):
        """With no free slot in the target level, the exiting env restarts
        its own level (documented capacity fallback)."""
        b, levels = bank
        state = b.reset(2)
        active = jnp.ones((2, 2), bool)  # both groups full
        state = state._replace(
            pos=state.pos.at[0, 0].set(jnp.array([-2.56, 0.68, -14.7]))
        )
        acts = null_actions(2)._replace(push=jnp.array([True, False]))
        bank_acts = _stack_actions(acts, 2)
        state1, active1, moved = jax.jit(b.step_with_exits)(state, active, bank_acts)
        assert not np.asarray(moved).any()
        assert np.asarray(active1).all()
        # Reset in place at E1M1's start.
        np.testing.assert_allclose(
            np.asarray(state1.pos[0, 0]),
            np.asarray(b.initial_states(2).pos[0, 0]),
            atol=1e-6,
        )

    def test_exit_soak_many_ticks(self, bank):
        """step_with_exits over many ticks with an env repeatedly reaching
        the exit: active-slot invariants hold (total active envs constant,
        at most one level active per migration event)."""
        b, _ = bank
        state = b.reset(2)
        active = jnp.array([[True, True], [False, False]])
        acts = null_actions(2)._replace(push=jnp.array([True, False]))
        bank_acts = _stack_actions(acts, 2)
        step_fn = jax.jit(b.step_with_exits)
        total0 = int(np.asarray(active).sum())
        # Park env (0,0) at the exit switch each tick until it migrates.
        for t in range(6):
            state = state._replace(
                pos=state.pos.at[0, 0].set(jnp.array([-2.56, 0.68, -14.7]))
            )
            state, active, moved = step_fn(state, active, bank_acts)
            assert int(np.asarray(active).sum()) == total0, t
            assert np.isfinite(np.asarray(state.pos)).all()
        # The env eventually moved into level 1's group.
        assert int(np.asarray(active[1]).sum()) >= 1
