"""Pallas movement-kernel equality: the fused collision kernel
(ops/collision_pallas.py) must reproduce the XLA sweep path bit for bit
(same formulas, same op order, same argmin tie rule)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.models import DoomSim
from tpu_doom.utils.config import GameConfig, PlayerConfig


def _sim(backend):
    return DoomSim(
        GameConfig(
            wad_file=":test:",
            width=64,
            height=40,
            batch_size=6,
            raster_backend="portal_jnp",
            player=PlayerConfig(
                clip_substeps=3, collision_backend=backend
            ),
        )
    )


def _rand_actions(sim, b, rng):
    acts = sim.null_actions(b)
    return acts._replace(
        movement=jnp.asarray(
            rng.uniform(-1.0, 1.0, (b, 2)).astype(np.float32)
        ),
        look=jnp.asarray(
            rng.uniform(-0.1, 0.1, (b, 2)).astype(np.float32)
        ),
        jump=jnp.asarray(rng.random(b) < 0.2),
        push=jnp.asarray(rng.random(b) < 0.2),
    )


def test_move_kernel_matches_xla_trajectories():
    """30 random-action ticks: the interpret-mode kernel path and the
    XLA path produce IDENTICAL states at every tick (trajectory-level
    bit equality -- any fp divergence would amplify through contact
    projections)."""
    sim_x = _sim("xla")
    sim_p = _sim("pallas_interpret")
    b = 6
    sx = sim_x.reset(b)
    sp = sim_p.reset(b)
    rng = np.random.default_rng(7)
    for tick in range(30):
        acts = _rand_actions(sim_x, b, rng)
        sx = sim_x.step(sx, acts)
        sp = sim_p.step(sp, acts)
        for name in ("pos", "vel", "last_height_diff", "object_offset"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sx, name)),
                np.asarray(getattr(sp, name)),
                err_msg=f"tick {tick}: {name} diverged",
            )


def test_move_kernel_noclip_and_fly():
    """Noclip ground snap + fly mode run through the kernel path too."""
    sim_x = _sim("xla")
    sim_p = _sim("pallas_interpret")
    b = 6
    sx = sim_x.reset(b)
    sp = sim_p.reset(b)
    rng = np.random.default_rng(3)
    toggle = sim_x.null_actions(b)._replace(
        clip_toggle=jnp.asarray(np.array([1, 0, 1, 0, 1, 0], bool)),
        fly_toggle=jnp.asarray(np.array([1, 1, 0, 0, 0, 0], bool)),
    )
    sx = sim_x.step(sx, toggle)
    sp = sim_p.step(sp, toggle)
    for _ in range(10):
        acts = _rand_actions(sim_x, b, rng)
        sx = sim_x.step(sx, acts)
        sp = sim_p.step(sp, acts)
    np.testing.assert_array_equal(np.asarray(sx.pos), np.asarray(sp.pos))
    np.testing.assert_array_equal(np.asarray(sx.vel), np.asarray(sp.vel))
