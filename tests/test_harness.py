"""Harness tests: CLI subcommands, DoomSim level flow, scan stepping,
checkpointing, graft entry."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.models import DoomSim
from tpu_doom.utils.config import GameConfig, PlayerConfig


@pytest.fixture(scope="module")
def sim():
    return DoomSim(
        GameConfig(
            wad_file=":test:",
            width=64,
            height=40,
            batch_size=2,
            player=PlayerConfig(clip_substeps=1, enable_noclip=False),
        )
    )


class TestDoomSim:
    def test_levels(self, sim):
        assert sim.num_levels == 2
        assert sim.list_levels()[0].startswith(b"E1M1")

    def test_check(self, sim):
        assert sim.check() >= 0.0

    def test_step_n_scan(self, sim):
        state = sim.reset(2)
        out = sim.step_n(state, None, 30)
        assert int(out.tick[0]) == 30
        # Scan result equals 30 sequential steps.
        seq = sim.reset(2)
        acts = sim.null_actions(2)
        for _ in range(30):
            seq = sim.step(seq, acts)
        np.testing.assert_allclose(
            np.asarray(out.pos), np.asarray(seq.pos), atol=1e-6
        )

    def test_handle_exits(self, sim):
        sim.load_level(0)
        state = sim.reset(2)
        state = state._replace(
            exit_triggered=jnp.array([1, 0], dtype=jnp.int32)
        )
        state = sim.handle_exits(state)
        assert sim.level_index == 1  # advanced to E1M2
        assert int(state.exit_triggered.sum()) == 0  # fresh state
        sim.load_level(0)

    def test_render_rgb(self, sim):
        sim.load_level(0)
        rgb = sim.render_rgb(sim.reset(2))
        assert rgb.shape == (2, 40, 64, 3) and rgb.dtype == np.uint8

    def test_checkpoint_roundtrip(self, sim, tmp_path):
        from tpu_doom.utils.checkpoint import load_state, save_state

        state = sim.reset(2)
        state = sim.step(state, sim.null_actions(2))
        path = str(tmp_path / "ck.npz")
        save_state(path, state, level=sim.level_index)
        state2, meta = load_state(path)
        for a, b in zip(state, state2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(meta["level"]) == sim.level_index


class TestCli:
    def _run(self, *args):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        return subprocess.run(
            [sys.executable, "-m", "tpu_doom.cli", *args],
            capture_output=True,
            text=True,
            timeout=600,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )

    def test_list_levels(self):
        r = self._run("--iwad", ":test:", "list-levels")
        assert r.returncode == 0
        assert "E1M1" in r.stdout and "E1M2" in r.stdout

    def test_check(self):
        r = self._run("--iwad", ":test:", "check")
        assert r.returncode == 0

    def test_version(self):
        r = self._run("--version")
        assert r.returncode == 0 and "tpu-doom" in r.stdout

    def test_dump_frames(self, tmp_path):
        """The reference-parity kit (PARITY.md): palette-index .npy frames
        + a manifest with exact camera state per dump."""
        import json

        r = self._run(
            "--iwad", ":test:", "-r", "64x40", "dump-frames",
            "--ticks", "21", "--every", "10", "--out", str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-500:]
        man = json.loads((tmp_path / "manifest.json").read_text())
        assert len(man["frames"]) == 3
        import numpy as np

        f0 = np.load(tmp_path / man["frames"][0]["file"])
        assert f0.shape == (40, 64) and f0.dtype == np.uint8
        assert {"pos", "yaw", "pitch", "time"} <= set(man["frames"][0])

    def test_demo_writes_pngs(self, tmp_path):
        r = self._run(
            "--iwad", ":test:", "-r", "64x40", "demo",
            "--ticks", "3", "--every", "2", "--out", str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-500:]
        pngs = list(tmp_path.glob("*.png"))
        assert pngs, r.stderr[-500:]
        assert pngs[0].read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


class TestGraftEntry:
    def test_entry_compiles(self):
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as g

        fn, args = g.entry()
        state, frames = jax.jit(fn)(*args)
        assert frames.shape == (2, 40, 64)
        assert frames.dtype == jnp.uint8


class TestRollout:
    def test_rollout_frames(self, sim):
        state = sim.reset(2)
        fs, frames = sim.rollout(state, None, 8)
        assert frames.shape == (8, 2, 40, 64)
        assert int(fs.tick[0]) == 8

    def test_rollout_render_every(self, sim):
        state = sim.reset(2)
        fs, frames = sim.rollout(state, None, 8, render_every=4)
        assert frames.shape == (2, 2, 40, 64)
        assert int(fs.tick[0]) == 8
        # The chunked path's last frame equals a direct render of the final
        # state.
        direct, _ = sim.render(fs)
        np.testing.assert_array_equal(np.asarray(frames[-1]), np.asarray(direct))

    def test_rollout_render_every_nondivisible(self, sim):
        """n % render_every trailing ticks still advance (VERDICT r2 #6:
        they used to be silently dropped)."""
        state = sim.reset(2)
        fs, frames = sim.rollout(state, None, 10, render_every=4)
        assert frames.shape == (2, 2, 40, 64)  # frames at ticks 4, 8
        assert int(fs.tick[0]) == 10  # ... but all 10 ticks stepped
        # Final state equals 10 plain steps.
        seq = sim.reset(2)
        acts = sim.null_actions(2)
        for _ in range(10):
            seq = sim.step(seq, acts)
        np.testing.assert_allclose(
            np.asarray(fs.pos), np.asarray(seq.pos), atol=1e-6
        )
        # The last emitted frame is the render of the tick-8 state.
        mid = sim.reset(2)
        for _ in range(8):
            mid = sim.step(mid, acts)
        direct, _ = sim.render(mid)
        np.testing.assert_array_equal(
            np.asarray(frames[-1]), np.asarray(direct)
        )

    def test_reset_exited_per_env(self, sim):
        """Env 0 exits and resets in place; env 1 is bit-untouched
        (VERDICT r2 #7)."""
        state = sim.reset(2)
        acts = sim.null_actions(2)
        for _ in range(5):
            state = sim.step(state, acts)
        ref = jax.tree_util.tree_map(np.asarray, state)
        exited = state._replace(
            exit_triggered=jnp.array([1, 0], dtype=jnp.int32)
        )
        out = jax.jit(sim.reset_exited)(exited)
        init = sim.reset(2)
        for name in state._fields:
            got, want0, want1 = (
                np.asarray(getattr(out, name)),
                np.asarray(getattr(init, name)),
                getattr(ref, name),
            )
            np.testing.assert_array_equal(got[0], want0[0], err_msg=name)
            np.testing.assert_array_equal(got[1], want1[1], err_msg=name)

    def test_rollout_uses_configured_backend(self):
        """rollout renders through raster_backend (portal here), matching
        per-tick step+render exactly (VERDICT r1: rollout ignored the
        backend)."""
        from tpu_doom.models import DoomSim
        from tpu_doom.utils.config import GameConfig, PlayerConfig

        simp = DoomSim(
            GameConfig(
                wad_file=":test:", width=48, height=32, batch_size=2,
                raster_backend="portal_jnp", portal_crossings=10,
                player=PlayerConfig(clip_substeps=1, enable_noclip=False),
            )
        )
        state = simp.reset(2)
        fs, frames = simp.rollout(state, None, 2)
        # Per-tick loop through the same backend.
        s = simp.reset(2)
        acts = simp.null_actions(2)
        for t in range(2):
            s = simp.step(s, acts)
            direct, _ = simp.render(s)
            np.testing.assert_array_equal(
                np.asarray(frames[t]), np.asarray(direct), err_msg=str(t)
            )


def test_zero_trigger_level_steps():
    """A level with NO triggers must step AND scan without error --
    apply_fired's exit reduction has no identity over an empty trigger
    table, and initial_state's trig_alive must carry K=0 through
    lax.scan (both were shipped regressions). The stress maze's only
    specials are scroll-48 lines, whose unimplemented 'Any' triggers
    (visitor.rs:446-496) stay in the ANALYSIS but are dropped from the
    device tables (firing one has no observable effect, ref
    level.rs:149-151) -- so the maze naturally builds the K=0 shape any
    real special-free map produces."""
    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    sim = DoomSim(GameConfig(
        wad_file=":stress:4", width=32, height=20, batch_size=1,
        raster_backend="portal_jnp",
        player=PlayerConfig(clip_substeps=1),
    ))
    # The analysis keeps the inert scroll-48 triggers (test_geom covers
    # that); the device tables drop them, leaving a genuinely empty set.
    assert sim.scene.trig_exit.shape[0] == 0
    assert not sim.arrays.eff_trigger.size
    state = sim.reset(1)
    assert state.trig_alive.shape == (1, 0)
    a = sim.null_actions(1)._replace(push=jnp.asarray([True]))
    state = sim.step(state, a)
    assert np.isfinite(np.asarray(state.pos)).all()
    # Scan path: the K=0 carry must round-trip (r3 regression).
    state = sim.step_n(state, None, 3)
    assert int(state.tick[0]) == 4


class TestSoak:
    def test_random_actions_stay_finite(self, sim):
        """600 ticks of random actions: no NaNs, player stays within the
        level's (generous) bounds, state invariants hold."""
        import jax.numpy as jnp

        rng = np.random.default_rng(42)
        state = sim.reset(2)
        acts = sim.null_actions(2)
        for t in range(600):
            a = acts._replace(
                movement=jnp.asarray(rng.uniform(-1, 1, (2, 2)), jnp.float32),
                look=jnp.asarray(rng.uniform(-0.1, 0.1, (2, 2)), jnp.float32),
                jump=jnp.asarray(rng.random(2) < 0.05),
                push=jnp.asarray(rng.random(2) < 0.02),
                shoot=jnp.asarray(rng.random(2) < 0.02),
                fly_toggle=jnp.asarray(rng.random(2) < 0.005),
                clip_toggle=jnp.asarray(rng.random(2) < 0.005),
            )
            state = sim.step(state, a)
        pos = np.asarray(state.pos)
        vel = np.asarray(state.vel)
        assert np.isfinite(pos).all() and np.isfinite(vel).all()
        # Level extents are ~[-16, 1] x [-6, 3] in game units; allow slack
        # for noclip wandering.
        assert (np.abs(pos) < 100).all()
        off = np.asarray(state.object_offset)
        assert np.isfinite(off).all() and (np.abs(off) < 10).all()
