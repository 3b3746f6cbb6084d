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
    b = 4
    sx = sim_x.reset(b)
    sp = sim_p.reset(b)
    rng = np.random.default_rng(7)
    for tick in range(8):
        acts = _rand_actions(sim_x, b, rng)
        sx = sim_x.step(sx, acts)
        sp = sim_p.step(sp, acts)
        for name in ("pos", "vel", "last_height_diff", "object_offset"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sx, name)),
                np.asarray(getattr(sp, name)),
                err_msg=f"tick {tick}: {name} diverged",
            )


def test_move_core_matches_sweep_sphere_oracle():
    """_move_core's sweeps vs the INDEPENDENTLY-written sweep_sphere
    oracle (the analytically-tested vector-form port of sphere.rs) on
    random triangle soups: same contacts to fp-association noise. The
    trajectory tests above prove pallas == jnp of the same graph; this
    one proves the graph computes the right thing."""
    from tpu_doom.ops.collision_pallas import (
        FEET_RADIUS,
        NOCLIP_PROBE_H,
        player_move_jnp,
    )
    from tpu_doom.sim.collision import sweep_sphere
    from tpu_doom.sim.player import _clip_move

    rng = np.random.default_rng(11)
    B, M = 16, 24
    radius, height, dt, substeps = 0.19, 0.21, 1.0 / 60.0, 3

    # Random small triangles near the origin plus a guaranteed floor
    # triangle under every env (so ground probes hit something).
    v0 = rng.uniform(-1.5, 1.5, (B, M, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1.0, 1.0, (B, M, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1.0, 1.0, (B, M, 3)).astype(np.float32)
    v0[:, 0] = np.array([-50.0, 0.0, -50.0], np.float32)
    v1[:, 0] = np.array([50.0, 0.0, -50.0], np.float32)
    v2[:, 0] = np.array([0.0, 0.0, 50.0], np.float32)
    n = np.cross(v1 - v0, v2 - v0)
    nm = np.linalg.norm(n, axis=-1, keepdims=True)
    ok = (nm[..., 0] > 1e-6)
    n = np.where(ok[..., None], n / np.maximum(nm, 1e-12), 0.0)
    mask = ok
    pos = rng.uniform(-1.0, 1.0, (B, 3)).astype(np.float32)
    pos[:, 1] = rng.uniform(0.15, 1.0, B).astype(np.float32)
    vel = rng.uniform(-3.0, 3.0, (B, 3)).astype(np.float32)

    rows = np.concatenate(
        [v0.transpose(0, 2, 1), v1.transpose(0, 2, 1), v2.transpose(0, 2, 1),
         n.transpose(0, 2, 1).astype(np.float32),
         mask[:, None, :].astype(np.float32)],
        axis=1,
    ).astype(np.float32)  # (B, 13, M)
    st8 = np.concatenate([pos, vel, np.zeros((B, 2), np.float32)], axis=1)
    mv = np.asarray(player_move_jnp(
        jnp.asarray(rows), jnp.asarray(st8), radius=radius, height=height,
        dt=dt, substeps=substeps, enable_noclip=True,
    ))

    tris_b = (jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
              jnp.asarray(n), jnp.asarray(mask))
    for e in range(B):
        tris = tuple(a[e] for a in tris_b)
        g = sweep_sphere(
            jnp.asarray(pos[e]), jnp.float32(FEET_RADIUS),
            jnp.asarray([0.0, -height, 0.0], jnp.float32),
            *tris[:4], tri_mask=tris[4],
        )
        # Near-tangency sweeps amplify fp-association noise through
        # sqrt(b^2-4c) (hundreds of ulps); 1e-3 still catches any real
        # math bug (sign, branch, missing test).
        np.testing.assert_allclose(mv[e, 0], float(g.time), rtol=1e-3)
        if np.isfinite(mv[e, 0]):
            np.testing.assert_allclose(
                mv[e, 1:4], np.asarray(g.normal), rtol=1e-3, atol=1e-3
            )
        import dataclasses as _dc

        from tpu_doom.utils.config import PlayerConfig

        pcfg = PlayerConfig(radius=radius, height=height,
                            clip_substeps=substeps)
        cp, cv = _clip_move(
            pcfg, tris, jnp.asarray(pos[e]), jnp.asarray(vel[e]),
            jnp.float32(dt), n_substeps=substeps,
        )
        np.testing.assert_allclose(mv[e, 4:7], np.asarray(cp),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(mv[e, 7:10], np.asarray(cv),
                                   rtol=1e-3, atol=1e-3)
        moved = pos[e] + vel[e] * dt
        probe_c = moved + np.array([0.0, 1.0, 0.0]) * (NOCLIP_PROBE_H / 2)
        nc = sweep_sphere(
            jnp.asarray(probe_c, dtype=jnp.float32), jnp.float32(radius),
            jnp.asarray([0.0, -NOCLIP_PROBE_H, 0.0], jnp.float32),
            *tris[:4], tri_mask=tris[4],
        )
        np.testing.assert_allclose(mv[e, 10], float(nc.time), rtol=1e-3)


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
