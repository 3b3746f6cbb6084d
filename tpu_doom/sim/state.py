"""SimState and Actions pytrees.

The reference's mutable state is scattered across systems (Player fields,
Level effects VecMap, object Transforms, GameShaders time uniform,
Tick index); here it is one NamedTuple of (B, ...) arrays -- trivially
checkpointable (SURVEY.md section 5) and scan/donate-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .scene import Scene


class SimState(NamedTuple):
    # Player (ref game/src/player.rs:110-116 + its Transform).
    pos: jnp.ndarray  # (B, 3)
    vel: jnp.ndarray  # (B, 3)
    yaw: jnp.ndarray  # (B,)
    pitch: jnp.ndarray  # (B,)
    fly: jnp.ndarray  # (B,) bool
    noclip: jnp.ndarray  # (B,) bool (reference `clip` inverted for clarity)
    last_height_diff: jnp.ndarray  # (B,)

    # Movable objects (ref Transforms disp[1] per object entity).
    object_offset: jnp.ndarray  # (B, O)

    # Active move effects per object (ref Level.effects VecMap).
    eff_active: jnp.ndarray  # (B, O) bool
    eff_first: jnp.ndarray  # (B, O)
    eff_second: jnp.ndarray  # (B, O)
    eff_has_second: jnp.ndarray  # (B, O) bool
    eff_wait: jnp.ndarray  # (B, O)
    eff_speed: jnp.ndarray  # (B, O)

    # Triggers (ref Level.triggers swap_remove -> alive mask).
    trig_alive: jnp.ndarray  # (B, K) bool

    exit_triggered: jnp.ndarray  # (B,) i32: 0 none, 1 normal, 2 secret
    time: jnp.ndarray  # (B,) f32 (ref GameShaders `time` uniform)
    tick: jnp.ndarray  # (B,) i32

    @property
    def batch(self) -> int:
        return self.pos.shape[0]


class Actions(NamedTuple):
    """Per-env input for one tick (ref PlayerBindings / Input gestures,
    engine/src/input.rs): the RL-facing action interface."""

    movement: jnp.ndarray  # (B, 2) strafe/forward in [-1, 1] (x+, y+ = D, S)
    look: jnp.ndarray  # (B, 2) yaw/pitch deltas (x+ = right, y+ = down)
    jump: jnp.ndarray  # (B,) bool
    fly_toggle: jnp.ndarray  # (B,) bool (edge-triggered)
    clip_toggle: jnp.ndarray  # (B,) bool
    push: jnp.ndarray  # (B,) bool ("use", E)
    shoot: jnp.ndarray  # (B,) bool


def initial_state(scene: Scene, num_objects: int, batch: int) -> SimState:
    """Player at level start (ref player.rs:119-133 reset), doors/lifts at
    rest, all triggers alive."""
    O = max(num_objects, 1)
    # K is the TRUE trigger count -- zero-size carries are fine under
    # lax.scan, and padding here while step() emits the unpadded shape
    # broke the scan carry on zero-trigger levels ((B,1) in, (B,0) out).
    K = scene.trig_origin.shape[0]
    zeros = jnp.zeros((batch,), dtype=jnp.float32)
    return SimState(
        pos=jnp.broadcast_to(scene.start_pos, (batch, 3)).astype(jnp.float32),
        vel=jnp.zeros((batch, 3), dtype=jnp.float32),
        yaw=jnp.broadcast_to(scene.start_yaw, (batch,)).astype(jnp.float32),
        pitch=jnp.full((batch,), 1e-8, dtype=jnp.float32),
        fly=jnp.zeros((batch,), dtype=bool),
        noclip=jnp.zeros((batch,), dtype=bool),
        last_height_diff=zeros,
        object_offset=jnp.zeros((batch, O), dtype=jnp.float32),
        eff_active=jnp.zeros((batch, O), dtype=bool),
        eff_first=jnp.zeros((batch, O), dtype=jnp.float32),
        eff_second=jnp.zeros((batch, O), dtype=jnp.float32),
        eff_has_second=jnp.zeros((batch, O), dtype=bool),
        eff_wait=jnp.zeros((batch, O), dtype=jnp.float32),
        eff_speed=jnp.zeros((batch, O), dtype=jnp.float32),
        trig_alive=jnp.ones((batch, K), dtype=bool),
        exit_triggered=jnp.zeros((batch,), dtype=jnp.int32),
        time=zeros,
        tick=jnp.zeros((batch,), dtype=jnp.int32),
    )


def null_actions(batch: int) -> Actions:
    return Actions(
        movement=jnp.zeros((batch, 2), dtype=jnp.float32),
        look=jnp.zeros((batch, 2), dtype=jnp.float32),
        jump=jnp.zeros((batch,), dtype=bool),
        fly_toggle=jnp.zeros((batch,), dtype=bool),
        clip_toggle=jnp.zeros((batch,), dtype=bool),
        push=jnp.zeros((batch,), dtype=bool),
        shoot=jnp.zeros((batch,), dtype=bool),
    )
