"""Phase-3 tests: collision analytics, light waveforms, effects state
machine, triggers, and an end-to-end gameplay scenario.

Compile time on the 1-core CPU host is the bottleneck, so the full-step
integration tests share one jitted step (module fixture) and unit tests
use tiny triangle sets.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.sim import (
    initial_state,
    null_actions,
    scene_from_arrays,
    step,
)
from tpu_doom.sim.collision import sweep_sphere
from tpu_doom.sim.effects import animate_effects
from tpu_doom.sim.lights import light_levels_at
from tpu_doom.utils.config import GameConfig, PlayerConfig


@pytest.fixture(scope="module")
def sim(archive, textures, metadata):
    from tpu_doom.geom.builder import compile_level

    arrays = compile_level(archive, textures, metadata, 0)
    scene, num_objects = scene_from_arrays(arrays)
    cfg = GameConfig(
        batch_size=1,
        player=PlayerConfig(clip_substeps=1, enable_noclip=False),
    )
    jstep = jax.jit(lambda s, a: step(scene, cfg, s, a))
    return scene, num_objects, cfg, jstep


def run(jstep, state, n, acts, **kw):
    a = acts._replace(**{k: jnp.asarray(v) for k, v in kw.items()})
    for _ in range(n):
        state = jstep(state, a)
    return jax.block_until_ready(state)


# ---------------------------------------------------------------------------
# Collision analytics (ref math/src/sphere.rs): hand-computable cases.
# ---------------------------------------------------------------------------


def _one_tri(v0, v1, v2, n):
    return (
        jnp.asarray([v0], dtype=jnp.float32),
        jnp.asarray([v1], dtype=jnp.float32),
        jnp.asarray([v2], dtype=jnp.float32),
        jnp.asarray([n], dtype=jnp.float32),
    )


class TestSweepSphere:
    def test_face_hit(self):
        # Big floor triangle at y=0, sphere falling from y=2, r=0.5,
        # displacement (0,-3,0): contact when center reaches y=0.5
        # -> distance 1.5 of 3 -> time 0.5.
        v0, v1, v2, n = _one_tri(
            (-10, 0, -10), (10, 0, -10), (0, 0, 10), (0, 1, 0)
        )
        c = sweep_sphere(
            jnp.array([0.0, 2.0, 0.0]), 0.5, jnp.array([0.0, -3.0, 0.0]),
            v0, v1, v2, n,
        )
        assert float(c.time) == pytest.approx(0.5, abs=1e-5)
        np.testing.assert_allclose(np.asarray(c.normal), [0, 1, 0], atol=1e-5)

    def test_miss_parallel(self):
        v0, v1, v2, n = _one_tri(
            (-10, 0, -10), (10, 0, -10), (0, 0, 10), (0, 1, 0)
        )
        c = sweep_sphere(
            jnp.array([0.0, 2.0, 0.0]), 0.5, jnp.array([3.0, 0.0, 0.0]),
            v0, v1, v2, n,
        )
        assert not bool(c.hit)

    def test_receding_ignored(self):
        v0, v1, v2, n = _one_tri(
            (-10, 0, -10), (10, 0, -10), (0, 0, 10), (0, 1, 0)
        )
        c = sweep_sphere(
            jnp.array([0.0, 2.0, 0.0]), 0.5, jnp.array([0.0, 3.0, 0.0]),
            v0, v1, v2, n,
        )
        assert not bool(c.hit)

    def test_behind_plane_ignored(self):
        # Center more than r behind the plane -> no contact (sphere.rs:41-43).
        v0, v1, v2, n = _one_tri(
            (-10, 0, -10), (10, 0, -10), (0, 0, 10), (0, 1, 0)
        )
        c = sweep_sphere(
            jnp.array([0.0, -2.0, 0.0]), 0.5, jnp.array([0.0, -1.0, 0.0]),
            v0, v1, v2, n,
        )
        assert not bool(c.hit)

    def test_edge_hit(self):
        # Sphere moving horizontally grazes the triangle's vertical edge.
        # Triangle in x-y plane (z=0), edge from (0,0,0) to (0,2,0);
        # sphere at (−2, 1, 0.3) moving +x with r=0.5 must hit the edge.
        v0, v1, v2, n = _one_tri((0, 0, 0), (0, 2, 0), (-0.0001, 2, -2), (1, 0, 0))
        c = sweep_sphere(
            jnp.array([2.0, 1.0, 0.3]), 0.5, jnp.array([-4.0, 0.0, 0.0]),
            v0, v1, v2, n,
        )
        assert bool(c.hit)
        # Contact when horizontal distance to edge = r: dx = sqrt(.25-.09)=.4
        expected = (2.0 - 0.4) / 4.0
        assert float(c.time) == pytest.approx(expected, abs=1e-4)

    def test_vertex_hit(self):
        # Head-on at a vertex.
        v0, v1, v2, n = _one_tri((0, 0, 0), (0, 1, 2), (0, -1, 2), (-1, 0, 0))
        c = sweep_sphere(
            jnp.array([-3.0, 0.0, 0.0]), 0.5, jnp.array([4.0, 0.0, 0.0]),
            v0, v1, v2, n,
        )
        assert bool(c.hit)
        assert float(c.time) == pytest.approx(2.5 / 4.0, abs=1e-4)

    def test_min_over_triangles(self):
        # Two stacked floors: contact must be with the nearer (higher) one.
        tris = (
            jnp.array([[-10, 1, -10], [-10, 0, -10]], dtype=jnp.float32),
            jnp.array([[10, 1, -10], [10, 0, -10]], dtype=jnp.float32),
            jnp.array([[0, 1, 10], [0, 0, 10]], dtype=jnp.float32),
            jnp.array([[0, 1, 0], [0, 1, 0]], dtype=jnp.float32),
        )
        c = sweep_sphere(
            jnp.array([0.0, 3.0, 0.0]), 0.5, jnp.array([0.0, -4.0, 0.0]), *tris
        )
        # Contact with y=1 floor at center y=1.5: distance 1.5/4.
        assert float(c.time) == pytest.approx(1.5 / 4.0, abs=1e-5)


# ---------------------------------------------------------------------------
# Light waveforms (ref game/src/lights.rs:33-64) vs a direct scalar port.
# ---------------------------------------------------------------------------


def _scalar_light(level, kind, alt, speed, duration, sync, t):
    fract = lambda x: x - math.floor(x)
    if kind == 0:
        return level
    if kind == 1:  # glow
        scale = level - alt
        phase = t * speed / scale
        return abs(0.5 - fract(phase)) * 2.0 * scale + alt
    if kind == 2:  # random
        tt = math.floor(t * speed)
        noise = fract(1.0 + math.sin((sync + tt / 1000.0) * 12.9898 + sync * 78.233) * 43758.547)
        return alt if noise < duration else level
    return alt if fract(t * speed + sync * 3.5435) < duration else level


class TestLights:
    def test_matches_scalar_port(self, sim):
        # RANDOM (flicker/flash) entries hash `sin` of O(1e5) arguments where
        # f32 range reduction is chaotic vs the f64 scalar port, so those are
        # checked statistically in test_random_duty_cycle instead.
        scene = sim[0]
        L = scene.light_level.shape[0]
        for t in (0.0, 0.4, 1.3, 7.77, 100.0):
            got = np.asarray(light_levels_at(scene, jnp.float32(t)))
            for i in range(L):
                if int(scene.light_kind[i]) == 2:
                    continue
                want = _scalar_light(
                    float(scene.light_level[i]),
                    int(scene.light_kind[i]),
                    float(scene.light_alt[i]),
                    float(scene.light_speed[i]),
                    float(scene.light_duration[i]),
                    float(scene.light_sync[i]),
                    t,
                )
                assert got[i] == pytest.approx(want, abs=2e-5), (i, t)

    def test_random_duty_cycle(self, sim):
        # Flicker (speed 8, duration 0.5): the sin-hash noise is ~uniform, so
        # the light should sit at alt_level roughly half the time.
        scene = sim[0]
        kinds = np.asarray(scene.light_kind)
        (ridx,) = np.nonzero(kinds == 2)
        i = int(ridx[0])
        alt = float(scene.light_alt[i])
        ts = np.arange(0.0, 60.0, 1.0 / 60.0, dtype=np.float32)
        vals = np.stack(
            [np.asarray(light_levels_at(scene, jnp.float32(t))) for t in ts]
        )[:, i]
        frac_alt = float((vals == np.float32(alt)).mean())
        assert 0.3 < frac_alt < 0.7

    def test_glow_oscillates(self, sim):
        scene = sim[0]
        kinds = np.asarray(scene.light_kind)
        (glow_idx,) = np.nonzero(kinds == 1)
        ts = np.linspace(0, 10, 200)
        vals = np.stack(
            [np.asarray(light_levels_at(scene, jnp.float32(t))) for t in ts]
        )[:, glow_idx[0]]
        assert vals.max() - vals.min() > 0.1


# ---------------------------------------------------------------------------
# Move-effect state machine (ref game/src/level.rs:202-255).
# ---------------------------------------------------------------------------


def _mk_effect_state(offset, first, second, has_second, wait, speed, active=True):
    from tpu_doom.sim.state import SimState

    z = jnp.zeros((1,), dtype=jnp.float32)
    f = lambda v: jnp.array([[v]], dtype=jnp.float32)
    b = lambda v: jnp.array([[v]], dtype=bool)
    return SimState(
        pos=jnp.zeros((1, 3)),
        vel=jnp.zeros((1, 3)),
        yaw=z,
        pitch=z,
        fly=jnp.zeros((1,), bool),
        noclip=jnp.zeros((1,), bool),
        last_height_diff=z,
        object_offset=f(offset),
        eff_active=b(active),
        eff_first=f(first),
        eff_second=f(second),
        eff_has_second=b(has_second),
        eff_wait=f(wait),
        eff_speed=f(speed),
        trig_alive=jnp.ones((1, 1), bool),
        exit_triggered=jnp.zeros((1,), jnp.int32),
        time=z,
        tick=jnp.zeros((1,), jnp.int32),
    )


class TestEffects:
    def test_moves_toward_first(self):
        s = _mk_effect_state(0.0, 1.0, 0.0, False, 0.0, 2.0)
        out = animate_effects(s, 0.1)
        assert float(out["object_offset"][0, 0]) == pytest.approx(0.2)
        assert bool(out["eff_active"][0, 0])

    def test_completes_and_waits_then_second(self):
        # offset 0 -> first 0.05 at speed 1 (reached in 0.05s), wait 0.02,
        # then second -1; in one dt=0.1 tick it should reach first, finish
        # the wait, promote second and start moving down by 0.03.
        s = _mk_effect_state(0.0, 0.05, -1.0, True, 0.02, 1.0)
        out = animate_effects(s, 0.1)
        assert float(out["object_offset"][0, 0]) == pytest.approx(0.05 - 0.03)
        assert bool(out["eff_active"][0, 0])
        assert not bool(out["eff_has_second"][0, 0])

    def test_finishes_and_deactivates(self):
        s = _mk_effect_state(0.95, 1.0, 0.0, False, 0.0, 1.0)
        out = animate_effects(s, 0.1)
        assert float(out["object_offset"][0, 0]) == pytest.approx(1.0)
        assert not bool(out["eff_active"][0, 0])

    def test_wait_blocks(self):
        s = _mk_effect_state(1.0, 1.0, 0.0, True, 0.5, 1.0)
        out = animate_effects(s, 0.1)
        assert float(out["eff_wait"][0, 0]) == pytest.approx(0.4)
        assert bool(out["eff_has_second"][0, 0])

    def test_inactive_untouched(self):
        s = _mk_effect_state(0.3, 1.0, 0.0, False, 0.0, 1.0, active=False)
        out = animate_effects(s, 0.1)
        assert float(out["object_offset"][0, 0]) == pytest.approx(0.3)


# ---------------------------------------------------------------------------
# Full gameplay scenario: one compiled step reused across all cases.
# ---------------------------------------------------------------------------


class TestGameplay:
    def test_scenario(self, sim):
        scene, num_objects, cfg, jstep = sim
        acts = null_actions(1)
        state0 = initial_state(scene, num_objects, 1)

        # 1. Idle: PD spring settles at floor + height - gravity sag.
        state = run(jstep, state0, 120, acts)
        sag = 17.0 / cfg.player.spring_const_p
        expect_y = 0.2 + cfg.player.height - sag  # probe radius 0.2
        assert float(state.pos[0, 1]) == pytest.approx(expect_y, abs=0.02)
        assert abs(float(state.vel[0, 1])) < 0.01

        # 2. Walk forward (facing -z): blocked by the closed door face at
        # z = -6.08 minus the head radius.
        state = run(jstep, state, 240, acts, movement=[[0.0, -1.0]])
        assert float(state.pos[0, 2]) == pytest.approx(
            -6.08 + cfg.player.radius, abs=0.01
        )
        assert float(state.pos[0, 0]) == pytest.approx(-2.56, abs=0.01)

        # 3. Push the door: ceiling object 1 rises to +0.92, waits 4s, closes.
        state = run(jstep, state, 1, acts, push=[True])
        assert bool(state.eff_active[0, 1])
        state_open = run(jstep, state, 150, acts)  # 2.5s > 0.92/0.7
        assert float(state_open.object_offset[0, 1]) == pytest.approx(0.92, abs=1e-4)
        state_closed = run(jstep, state_open, 60 * 6, acts)
        assert float(state_closed.object_offset[0, 1]) == pytest.approx(0.0, abs=1e-4)

        # 4. Walk through the open door into the big room (z < -7.68) and
        # drop onto its floor at -0.32.
        state = run(jstep, state_open, 120, acts, movement=[[0.0, -1.0]])
        assert float(state.pos[0, 2]) < -7.68
        state = run(jstep, state, 60, acts)
        assert float(state.pos[0, 1]) == pytest.approx(-0.32 + expect_y, abs=0.03)
        assert int(state.exit_triggered[0]) == 0

    def test_lift_walkover(self, sim):
        scene, num_objects, cfg, jstep = sim
        acts = null_actions(1)
        state = initial_state(scene, num_objects, 1)
        # The raised lift blocks entry from the big room (correct Doom
        # behavior: the WR line on its edge can't be crossed from below), so
        # step OFF the lift: stand on it just behind the line (z = -12.8)
        # and walk backward (+z) across it.
        state = state._replace(
            pos=jnp.array([[-2.56, 0.66, -12.9]], dtype=jnp.float32)
        )
        state = run(jstep, state, 40, acts, movement=[[0.0, 1.0]])
        # Crossing the line fires the WR lift (object 2 -> LowestFloor).
        assert bool(state.eff_active[0, 2]) or (
            float(state.object_offset[0, 2]) < 0.0
        )
        state = run(jstep, state, 120, acts)
        # Fully lowered by 0.64 within 2s at speed 0.7 (then waits 3s).
        assert float(state.object_offset[0, 2]) == pytest.approx(-0.64, abs=1e-3)
        # Trigger is repeatable (WR, not only_once): still alive.
        assert bool(state.trig_alive[0].sum() == state.trig_alive.shape[1])

    def test_exit_switch(self, sim):
        scene, num_objects, cfg, jstep = sim
        acts = null_actions(1)
        state = initial_state(scene, num_objects, 1)
        # Ledge room: floor 0.32; exit switch wall at z = -15.04 facing -z.
        state = state._replace(
            pos=jnp.array([[-2.56, 0.68, -14.7]], dtype=jnp.float32)
        )
        state = run(jstep, state, 1, acts, push=[True])
        assert int(state.exit_triggered[0]) == 1
        # only_once: the exit trigger is now dead.
        assert int(state.trig_alive[0].sum()) == state.trig_alive.shape[1] - 1
        # Pushing again changes nothing.
        state = run(jstep, state, 1, acts, push=[True])
        assert int(state.exit_triggered[0]) == 1

    def test_fly_toggle(self, sim):
        scene, num_objects, cfg, jstep = sim
        acts = null_actions(1)
        state = initial_state(scene, num_objects, 1)
        state = run(jstep, state, 1, acts, fly_toggle=[True])
        assert bool(state.fly[0])
        # While flying there is no gravity: y velocity stays ~0.
        state = run(jstep, state, 60, acts)
        assert abs(float(state.vel[0, 1])) < 0.3

    def test_batch_consistency(self, sim, archive, textures, metadata):
        """Env 0 of a batch == single-env run (SURVEY.md section 4)."""
        scene, num_objects, cfg, jstep = sim
        state1 = initial_state(scene, num_objects, 1)
        acts1 = null_actions(1)._replace(
            movement=jnp.array([[0.3, -1.0]]), look=jnp.array([[0.01, 0.0]])
        )
        state4 = initial_state(scene, num_objects, 4)
        acts4 = null_actions(4)._replace(
            movement=jnp.tile(jnp.array([[0.3, -1.0]]), (4, 1)),
            look=jnp.tile(jnp.array([[0.01, 0.0]]), (4, 1)),
        )
        # Different actions for other envs to prove independence.
        acts4 = acts4._replace(
            movement=acts4.movement.at[2].set(jnp.array([-1.0, 0.0]))
        )
        jstep4 = jax.jit(lambda s, a: step(scene, cfg, s, a))
        s1, s4 = state1, state4
        for _ in range(45):
            s1 = jstep(s1, acts1)
            s4 = jstep4(s4, acts4)
        np.testing.assert_allclose(
            np.asarray(s1.pos[0]), np.asarray(s4.pos[0]), atol=1e-6
        )
        # Env 2 went elsewhere.
        assert not np.allclose(np.asarray(s4.pos[2]), np.asarray(s4.pos[0]))


class TestTriggerSemantics:
    def test_shoot_does_not_push(self, sim):
        """Push/Switch triggers respond only to the Push action; Gun
        triggers only to Shoot (ref level.rs:105-120)."""
        scene, num_objects, cfg, jstep = sim
        acts = null_actions(1)
        state = initial_state(scene, num_objects, 1)
        state = state._replace(
            pos=jnp.array([[-2.56, 0.33, -5.9]], dtype=jnp.float32)
        )
        # Shooting the door: nothing happens (it is Push, not Gun).
        state = run(jstep, state, 1, acts, shoot=[True])
        assert not bool(state.eff_active[0, 1])
        # Pushing it: the door effect starts.
        state = run(jstep, state, 1, acts, push=[True])
        assert bool(state.eff_active[0, 1])

    def test_push_range_limited(self, sim):
        """Push range is 0.5 units (ref level.rs:90): too far = no-op."""
        scene, num_objects, cfg, jstep = sim
        acts = null_actions(1)
        state = initial_state(scene, num_objects, 1)
        state = state._replace(
            pos=jnp.array([[-2.56, 0.33, -7.5]], dtype=jnp.float32)
        )
        # The door's east trigger line is at z=-6.72: 0.78 away when facing
        # +z from -7.5, beyond the 0.5 push range.
        state = state._replace(yaw=jnp.array([jnp.pi], dtype=jnp.float32))
        state = run(jstep, state, 1, acts, push=[True])
        assert not bool(state.eff_active[0, 1])
