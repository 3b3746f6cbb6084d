"""Scan-based integration smoke per fixture (VERDICT r3 #7).

Every fixture must survive a *scan-based* rollout (step under
`lax.scan` + render every tick), not just eager stepping: round 3
shipped a zero-trigger scan-carry crash (`initial_state` padded
`trig_alive` to K=1 while `step` emitted K=0) that only a scan
catches. Backend is portal_interpret so the Pallas kernel code path
is traced (interpret mode on the CPU test platform).

Reference tick loop being exercised: game/src/game.rs:51-78.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.models import DoomSim
from tpu_doom.utils.config import GameConfig, PlayerConfig


def _rollout_smoke(wad: str, backend: str = "portal_interpret"):
    sim = DoomSim(
        GameConfig(
            wad_file=wad, width=32, height=24, batch_size=2,
            raster_backend=backend, render_env_chunk=0,
            portal_crossings=8,
            player=PlayerConfig(clip_substeps=1),
        )
    )
    state = sim.reset(2)
    # Walk forward + turn so the scan carry actually changes.
    acts = sim.null_actions(2)
    acts = acts._replace(
        movement=jnp.asarray([[0.0, 1.0], [0.0, 1.0]], jnp.float32),
        look=jnp.asarray([[0.05, 0.0], [-0.05, 0.0]], jnp.float32),
        push=jnp.asarray([True, False]),
    )
    import jax

    seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), acts
    )
    final, frames = sim.rollout(state, seq, 2)
    assert frames.shape == (2, 2, 24, 32)
    assert int(final.tick[0]) == 2
    # trig_alive carry shape must equal the TRUE trigger count
    # (zero-size allowed) so scan carries round-trip.
    assert final.trig_alive.shape == (2, sim.scene.trig_origin.shape[0])
    assert np.isfinite(np.asarray(final.pos)).all()
    # step_n (pure stepping scan) must also carry cleanly.
    s2 = sim.step_n(sim.reset(2), None, 2)
    assert int(s2.tick[0]) == 2
    return final, frames


def test_rollout_test_fixture():
    _rollout_smoke(":test:")


def test_rollout_doom2():
    _rollout_smoke(":doom2:")


def test_rollout_stress():
    # Many-sector maze (its only triggers are inert unimplemented
    # scroll-48 'Any' entries, mirroring visitor.rs:446-496; the K=0
    # scan-carry regression proper lives in test_harness).
    _rollout_smoke(":stress:6")


def test_rollout_texstress():
    # Stress maze + active-set texture tables.
    _rollout_smoke(":texstress:6x24")


def test_rollout_bank():
    """LevelBank scan: step_with_exits + vmapped render under lax.scan."""
    import jax

    from tpu_doom.geom.builder import compile_level
    from tpu_doom.models.level_bank import LevelBank
    from tpu_doom.sim.state import null_actions

    cfg = GameConfig(
        wad_file=":test:", width=32, height=24,
        raster_backend="portal_interpret", render_env_chunk=0,
        portal_crossings=8,
        player=PlayerConfig(clip_substeps=1),
    )
    sim1 = DoomSim(cfg)
    import dataclasses

    sim2 = DoomSim(dataclasses.replace(cfg, wad_file=":doom2:"))
    levels = [
        compile_level(sim1.wad, sim1.textures, sim1.metadata, 0),
        compile_level(sim2.wad, sim2.textures, sim2.metadata, 0),
    ]
    bank = LevelBank(levels, cfg)
    L, E = bank.num_levels, 2
    state = bank.reset(E)
    acts = jax.tree_util.tree_map(
        lambda x: x.reshape((L, E) + x.shape[1:]), null_actions(L * E)
    )

    active = jnp.ones((L, E), bool)

    @jax.jit
    def run(s, act):
        def body(carry, _):
            s, act = carry
            s, act, _ = bank.step_with_exits(s, act, acts)
            idx, cov = bank.render(s, 32, 24)
            return (s, act), idx.sum(dtype=jnp.uint32)

        return jax.lax.scan(body, (s, act), None, length=2)

    (final, _), sums = run(state, active)
    assert sums.shape == (2,)
    assert np.isfinite(np.asarray(final.pos)).all()
