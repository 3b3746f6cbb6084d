"""Phase-4 tests: the pure-jnp software rasterizer.

Behavioral checks against the scene (animation, scroll, lights, doors,
transparency, sky) rather than golden images -- the Pallas kernel equality
tests (ops/) will later pin this path as the reference output.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.render import frames_to_rgb, render_frames
from tpu_doom.sim import initial_state, scene_from_arrays
from tpu_doom.utils.config import GameConfig

W, H = 120, 80


@pytest.fixture(scope="module")
def rsim(archive, textures, metadata):
    from tpu_doom.geom.builder import compile_level

    arrays = compile_level(archive, textures, metadata, 0)
    scene, num_objects = scene_from_arrays(arrays)
    cfg = GameConfig()
    return arrays, scene, num_objects, cfg


def rend(scene, cfg, state):
    idx, cov = render_frames(scene, cfg, state, W, H)
    return np.asarray(idx), np.asarray(cov)


def at(state, i, *, pos=None, yaw=None, time=None, door=None, lift=None):
    if pos is not None:
        state = state._replace(
            pos=state.pos.at[i].set(jnp.asarray(pos, jnp.float32))
        )
    if yaw is not None:
        state = state._replace(yaw=state.yaw.at[i].set(yaw))
    if time is not None:
        state = state._replace(time=state.time.at[i].set(time))
    if door is not None:
        state = state._replace(
            object_offset=state.object_offset.at[i, 1].set(door)
        )
    if lift is not None:
        state = state._replace(
            object_offset=state.object_offset.at[i, 2].set(lift)
        )
    return state


class TestRaster:
    def test_start_view_covered(self, rsim):
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 1)
        idx, cov = rend(scene, cfg, state)
        # Indoor start view: every pixel covered, many distinct shades.
        assert cov.mean() == 1.0
        assert len(np.unique(idx)) > 20

    def test_batch_identical(self, rsim):
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 3)
        idx, cov = rend(scene, cfg, state)
        np.testing.assert_array_equal(idx[0], idx[1])
        np.testing.assert_array_equal(idx[0], idx[2])

    def test_door_opening_changes_frame(self, rsim):
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 2)
        # Stand in the corridor facing the closed door.
        for i in range(2):
            state = at(state, i, pos=[-2.56, 0.33, -5.3])
        state = at(state, 1, door=0.92)
        idx, cov = rend(scene, cfg, state)
        closed, opened = idx[0], idx[1]
        assert (closed != opened).mean() > 0.05
        # With the door open the corridor beyond is visible: the open frame
        # must contain far-darker pixels in the center band.
        cy, cx = H // 2, W // 2
        assert opened[cy - 5 : cy + 5, cx - 10 : cx + 10].min() <= closed[
            cy - 5 : cy + 5, cx - 10 : cx + 10
        ].min()

    def test_animated_flat(self, rsim):
        """NUKAGE frames swap every 8/35s (static.vert ANIM_FPS)."""
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 2)
        # Above the nukage pool looking straight at it.
        for i in range(2):
            state = at(state, i, pos=[-1.9, 0.2, -8.2])
        state = at(state, 1, time=8.0 / 35.0 + 1e-3)
        idx, cov = rend(scene, cfg, state)
        assert (idx[0] != idx[1]).mean() > 0.01

    def test_scrolling_wall(self, rsim):
        """The west wall of the start room scrolls at 35 u/s."""
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 2)
        # The special-48 linedef is wad x=0 -> the game z=0 wall; face +z.
        for i in range(2):
            state = at(state, i, pos=[-2.56, 0.33, -2.5], yaw=math.pi)
        state = at(state, 1, time=0.5)
        idx, cov = rend(scene, cfg, state)
        assert (idx[0] != idx[1]).mean() > 0.02

    def test_flicker_light(self, rsim):
        """Flicker-zone brightness differs between on/off noise phases."""
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 8)
        for i in range(8):
            state = at(
                state, i, pos=[-3.84, 0.0, -10.9], yaw=math.pi, time=0.12 * i
            )
        idx, cov = rend(scene, cfg, state)
        means = idx.reshape(8, -1).mean(axis=1)
        assert means.std() > 0.5  # light level jumps between frames

    def test_grate_transparency(self, rsim):
        """Looking through the grate: gap columns show the space behind."""
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 1)
        # Grate plane at z=-10 spanning x in [-4.48, -2.56], hanging from
        # the sky ceiling down to y=0.64. Stand close, fly-height, face it.
        state = at(state, 0, pos=[-3.5, 1.0, -9.0])
        idx, cov = rend(scene, cfg, state)
        # Rows in the upper half alternate between grate texels (dark 30-40
        # base, so index < 45) and the far wall beyond.
        upper = idx[0][: H // 3]
        assert (upper < 45).any()  # grate body visible
        assert (upper > 60).any()  # something behind shows through

    def test_sky_visible(self, rsim):
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 2)
        # Big room looking up-ish at the sky (pitch via look is state.pitch).
        state = at(state, 0, pos=[-2.2, 0.2, -9.5])
        state = state._replace(pitch=state.pitch.at[0].set(0.9))
        state = at(state, 1, pos=[-2.2, 0.2, -9.5], yaw=1.5)
        state = state._replace(pitch=state.pitch.at[1].set(0.9))
        idx, cov = rend(scene, cfg, state)
        # Sky gradient: top rows show a wide range of indices (the SKY1
        # horizontal gradient), and yaw changes shift the sky.
        top0, top1 = idx[0][:10], idx[1][:10]
        assert len(np.unique(top0)) > 8
        assert (top0 != top1).mean() > 0.3

    def test_barrel_sprite(self, rsim):
        """The barrel billboard shows up and faces the camera from any yaw."""
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 2)
        # Barrel at game (-3.8, -11.0); stand nearby, face it from 2 angles.
        state = at(state, 0, pos=[-3.8, 0.0, -9.8])  # looking -z at it
        state = at(state, 1, pos=[-2.8, 0.0, -11.0], yaw=math.pi / 2)
        idx, cov = rend(scene, cfg, state)
        # Barrel body indices are 90..150 band (wadgen), brighter than the
        # floor behind; detect a contiguous blob in the center.
        for f in range(2):
            center = idx[f][H // 3 : 2 * H // 3, W // 3 : 2 * W // 3]
            assert ((center >= 60) & (center <= 160)).mean() > 0.05

    def test_rgb_conversion(self, rsim):
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 1)
        idx, cov = render_frames(scene, cfg, state, W, H)
        rgb = np.asarray(frames_to_rgb(arrays.palette, idx, cov))
        assert rgb.shape == (1, H, W, 3)
        # Grayscale palette: all three channels equal.
        np.testing.assert_array_equal(rgb[..., 0], rgb[..., 1])

    def test_lift_offset_moves_geometry(self, rsim):
        arrays, scene, num_objects, cfg = rsim
        state = initial_state(scene, num_objects, 2)
        for i in range(2):
            state = at(state, i, pos=[-2.56, 0.2, -12.0])
        state = at(state, 1, lift=-0.64)
        idx, cov = rend(scene, cfg, state)
        assert (idx[0] != idx[1]).mean() > 0.02


def test_env_chunked_render_matches_unchunked(rsim):
    """render_env_chunk scans env blocks through the renderer; output must
    be identical to the unchunked path (incl. a non-divisible batch)."""
    import dataclasses

    from tpu_doom.render import render_dispatch

    arrays, scene, num_objects, cfg = rsim
    state = initial_state(scene, num_objects, 5)
    # Spread envs out so frames differ.
    state = state._replace(yaw=jnp.arange(5, dtype=jnp.float32) * 0.7)
    cfg0 = dataclasses.replace(cfg, render_env_chunk=0)
    cfg2 = dataclasses.replace(cfg, render_env_chunk=2)
    i0, c0 = render_dispatch(scene, None, cfg0, state, 64, 40)
    i2, c2 = render_dispatch(scene, None, cfg2, state, 64, 40)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c2))
