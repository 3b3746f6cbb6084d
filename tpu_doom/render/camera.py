"""Camera matrices: view from the player transform, gluPerspective-style
projection.

Reference: engine/src/renderer.rs:78-96 (view = inverse of the camera's
absolute transform; projection from the camera Projection component),
engine/src/projections.rs:93-102 (cgmath::perspective(fov, aspect, near,
far) -- fov is the VERTICAL field of view), game/src/player.rs:325-345
(camera = player child at +camera_height, aspect = (w/h) *
aspect_ratio_correction).
"""

from __future__ import annotations

import jax.numpy as jnp


def perspective(fovy_rad, aspect, near, far):
    """gluPerspective matrix (row-major, right-handed, z in [-1, 1])."""
    f = 1.0 / jnp.tan(fovy_rad / 2.0)
    m = jnp.zeros((4, 4), dtype=jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set((far + near) / (near - far))
    m = m.at[2, 3].set(2.0 * far * near / (near - far))
    m = m.at[3, 2].set(-1.0)
    return m


def rotation_yaw_pitch(yaw, pitch):
    """R = R_y(yaw) @ R_x(pitch) as a 3x3 (matches the reference's always-
    yaw∘pitch camera quaternion)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cx, sx = jnp.cos(pitch), jnp.sin(pitch)
    ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]], dtype=jnp.float32)
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]], dtype=jnp.float32)
    return ry @ rx


def camera_matrices(pos, yaw, pitch, *, camera_height, fovy_rad, aspect, near, far):
    """(modelview, projection) for one env.

    The camera entity sits at player_pos + R @ (0, camera_height, 0) with
    the player's rotation (player.rs:325-336); view = inverse transform."""
    r = rotation_yaw_pitch(yaw, pitch)
    cam_pos = pos + r @ jnp.array([0.0, camera_height, 0.0], dtype=jnp.float32)
    rt = r.T
    mv = jnp.zeros((4, 4), dtype=jnp.float32)
    mv = mv.at[:3, :3].set(rt)
    mv = mv.at[:3, 3].set(-rt @ cam_pos)
    mv = mv.at[3, 3].set(1.0)
    proj = perspective(fovy_rad, aspect, near, far)
    return mv, proj
