"""Player physics: movement force, PD ground spring, gravity, swept-sphere
clipping.

Reference behavior: /root/reference/game/src/player.rs:135-311 with the
same constants (Config defaults, player.rs:72-92). The reference stores
orientation as a quaternion that is always yaw∘pitch; we keep (yaw, pitch)
scalars, updated identically (yaw += -look.x; pitch += clamp(-look.y) with
the same clamping window, player.rs:205-217).

Single-env functions; vmapped in sim.step. The reference's clip loop runs
up to 100 data-dependent iterations (player.rs:142-166); in lockstep batch
mode we run a fixed number of masked substeps (config.clip_substeps).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..utils.config import PlayerConfig
from .collision import Contact, sweep_sphere

GRAVITY = 17.0  # ref player.rs:308
JUMP_SPEED = 5.0  # ref player.rs:233 (impulse 5.0/dt applied for one dt)
FEET_RADIUS = 0.2  # ref player.rs:254-256


class PlayerStep(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    yaw: jnp.ndarray
    pitch: jnp.ndarray
    last_height_diff: jnp.ndarray


def rotate_vec(yaw, pitch, v):
    """R_y(yaw) @ R_x(pitch) @ v -- the reference's quaternion is always
    yaw∘pitch so this matches rot.rotate_vector()."""
    cx, sx = jnp.cos(pitch), jnp.sin(pitch)
    vy = v[1] * cx - v[2] * sx
    vz = v[1] * sx + v[2] * cx
    vx = v[0]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([vx * cy + vz * sy, vy, -vx * sy + vz * cy])


def look_direction(yaw, pitch):
    """Forward vector rot * (0,0,-1) (ref level.rs:86)."""
    return rotate_vec(yaw, pitch, jnp.array([0.0, 0.0, -1.0], dtype=jnp.float32))


def _normalize_or_zero(v):
    m = jnp.sqrt(jnp.sum(v * v))
    return jnp.where(m >= 1e-16, v / jnp.where(m >= 1e-16, m, 1.0), jnp.zeros_like(v))


def _sweep(tris, center, radius, displacement):
    v0, v1, v2, n = tris[:4]
    mask = tris[4] if len(tris) > 4 else None
    return sweep_sphere(center, radius, displacement, v0, v1, v2, n, mask)


def step_player(
    cfg: PlayerConfig,
    timestep: float,
    tris,  # (v0, v1, v2, normal): object-offset collision soup for this env
    pos,
    vel,
    yaw,
    pitch,
    fly,
    noclip,
    last_height_diff,
    movement,  # (2,)
    look,  # (2,)
    jump,
):
    """One tick of player physics (ref player.rs:359-408 update order:
    force -> clip/noclip -> pos commit -> vel += force*dt).

    XLA path: runs the six collision sweeps inline. The Pallas path
    (ops/collision_pallas.py) computes the same sweeps in one kernel and
    feeds `step_player_with_moves` below; both share this function's
    post-sweep math via that entry point."""
    dt = jnp.float32(timestep)

    # -- the six sweeps (ground probe, clip substeps, noclip probe) ------
    feet_probe = jnp.array([0.0, -1.0, 0.0], dtype=jnp.float32) * cfg.height
    ground = _sweep(tris, pos, jnp.float32(FEET_RADIUS), feet_probe)
    clipped_pos, clipped_vel = _clip_move(
        cfg, tris, pos, vel, dt, n_substeps=cfg.clip_substeps
    )
    nc_time = (
        _noclip_probe(cfg, tris, pos, vel, dt)
        if cfg.enable_noclip
        else jnp.float32(jnp.inf)
    )
    return step_player_with_moves(
        cfg, timestep, ground, clipped_pos, clipped_vel, nc_time,
        pos, vel, yaw, pitch, fly, noclip, last_height_diff,
        movement, look, jump,
    )


def step_player_with_moves(
    cfg: PlayerConfig,
    timestep: float,
    ground: Contact,  # feet-probe contact
    clipped_pos,  # clip-move result (pre-force)
    clipped_vel,
    nc_time,  # noclip ground-probe contact time (inf when disabled)
    pos,
    vel,
    yaw,
    pitch,
    fly,
    noclip,
    last_height_diff,
    movement,  # (2,)
    look,  # (2,)
    jump,
):
    """Post-sweep player math, shared by the XLA and Pallas collision
    backends (identical formulas -> bit-identical trajectories)."""
    dt = jnp.float32(timestep)

    # -- look update with pitch clamp (player.rs:205-217) ----------------
    half_pi = jnp.float32(math.pi / 2)
    clamped_pitch_by = jnp.clip(
        -look[1], 1e-2 - half_pi - pitch, half_pi - 1e-2 - pitch
    )
    new_pitch = pitch + clamped_pitch_by
    new_yaw = yaw - look[0]

    # -- ground probe (player.rs:253-267) --------------------------------
    grounded = ground.hit & (ground.time < 1.0)
    height = jnp.where(grounded, cfg.height * ground.time, cfg.height)
    ground_normal = jnp.where(grounded, ground.normal, jnp.zeros(3))

    # -- movement force (player.rs:192-241) --------------------------------
    move3 = jnp.stack([movement[0], 0.0, movement[1]])
    jump_up = jnp.where(jump, 0.5, 0.0)
    fly_dir = _normalize_or_zero(
        jnp.stack([movement[0], jump_up, movement[1]])
    )
    fly_force = rotate_vec(new_yaw, new_pitch, fly_dir) * cfg.move_force

    walk = rotate_vec(new_yaw, new_pitch, move3)
    walk = walk.at[1].set(0.0)
    walk = _normalize_or_zero(walk) * cfg.move_force
    jumping = grounded & jump & (vel[1] < 0.1)
    walk_grounded = jnp.where(
        jumping,
        jnp.stack([walk[0], JUMP_SPEED / dt, walk[2]]),
        walk,
    )
    ground_force = jnp.where(grounded, walk_grounded, walk * 0.1)
    move_force = jnp.where(fly, fly_force, ground_force)

    # -- slowdown: friction + drags (player.rs:276-301) ----------------------
    speed = jnp.sqrt(jnp.sum(vel * vel))
    has_speed = speed > 0.0
    safe_speed = jnp.where(has_speed, speed, 1.0)

    fly_slow = -vel * (cfg.friction / safe_speed + cfg.ground_drag * speed)
    tangential = vel - ground_normal * jnp.dot(ground_normal, vel)
    tspeed = jnp.sqrt(jnp.sum(tangential * tangential))
    has_t = tspeed > 0.0
    ground_slow = jnp.where(
        has_t,
        -tangential * (cfg.friction / jnp.where(has_t, tspeed, 1.0) + cfg.ground_drag * tspeed),
        jnp.zeros(3),
    )
    slowdown = jnp.where(
        fly, fly_slow, jnp.where(grounded, ground_slow, jnp.zeros(3))
    )
    slowdown = slowdown - vel * cfg.air_drag * speed
    slow_norm = jnp.sqrt(jnp.sum(slowdown * slowdown))
    has_slow = has_speed & (slow_norm > 0.0)
    max_slowdown = -jnp.dot(vel, slowdown) / jnp.where(has_slow, slow_norm, 1.0) / dt
    clamped = jnp.where(
        slow_norm >= max_slowdown, slowdown / jnp.where(has_slow, slow_norm, 1.0) * max_slowdown, slowdown
    )
    force = move_force + jnp.where(has_slow, clamped, jnp.zeros(3))

    # -- PD hover spring + gravity (player.rs:302-309) ---------------------
    height_diff = cfg.height - height
    derivative = (height_diff - last_height_diff) / dt
    force = force.at[1].add(
        height_diff * cfg.spring_const_p + derivative * cfg.spring_const_d
    )
    force = force.at[1].add(jnp.where(fly, 0.0, -GRAVITY))

    # -- move: clip or noclip (player.rs:142-190) ---------------------------
    if cfg.enable_noclip:
        noclip_pos, noclip_vel = _noclip_post(pos, vel, dt, fly, nc_time)
        new_pos = jnp.where(noclip, noclip_pos, clipped_pos)
        new_vel = jnp.where(noclip, noclip_vel, clipped_vel)
    else:
        new_pos, new_vel = clipped_pos, clipped_vel

    # Velocity integrates force AFTER the move (player.rs:394-395).
    new_vel = new_vel + force * dt

    return PlayerStep(
        pos=new_pos,
        vel=new_vel,
        yaw=new_yaw,
        pitch=new_pitch,
        last_height_diff=height_diff,
    )


def _clip_move(cfg: PlayerConfig, tris, pos, vel, dt, n_substeps: int):
    """Masked fixed-iteration version of the reference's sweep-project loop
    (player.rs:142-166): advance to contact, kill the normal component of
    velocity, repeat with the remaining time."""
    time_left = dt
    done = jnp.bool_(False)
    for _ in range(n_substeps):
        displacement = vel * time_left
        contact = _sweep(tris, pos, jnp.float32(cfg.radius), displacement)
        dmag = jnp.sqrt(jnp.sum(displacement * displacement))
        adjusted = contact.time - 0.001 / jnp.where(dmag > 0.0, dmag, 1.0)
        blocked = contact.hit & (adjusted < 1.0) & ~done
        t = jnp.clip(contact.time, 0.0, 1.0)
        pos = jnp.where(
            done,
            pos,
            jnp.where(blocked, pos + displacement * adjusted, pos + displacement),
        )
        vel = jnp.where(
            blocked, vel - contact.normal * jnp.dot(contact.normal, vel), vel
        )
        time_left = jnp.where(blocked, time_left * (1.0 - t), time_left)
        done = done | ~blocked
    return pos, vel


NOCLIP_PROBE_H = 2000.0  # ref player.rs:171


def _noclip_probe(cfg, tris, pos, vel, dt):
    """The noclip ground-probe sweep (player.rs:168-178): from the moved
    position, a NOCLIP_PROBE_H-tall downward sweep with the clip radius.
    Returns the contact time (inf when no contact)."""
    moved = pos + vel * dt
    probe_h = jnp.float32(NOCLIP_PROBE_H)
    probe_center = moved + jnp.array([0.0, 1.0, 0.0]) * (probe_h / 2.0)
    contact = _sweep(
        tris, probe_center, jnp.float32(cfg.radius),
        jnp.array([0.0, -1.0, 0.0]) * probe_h,
    )
    return contact.time


def _noclip_post(pos, vel, dt, fly, nc_time):
    """Free movement with downward ground snap when not flying
    (player.rs:168-190), from a precomputed probe contact time."""
    old_y = pos[1]
    pos = pos + vel * dt
    probe_h = jnp.float32(NOCLIP_PROBE_H)
    ground_y = jnp.where(
        jnp.isfinite(nc_time), pos[1] + probe_h * (0.5 - nc_time), old_y
    )
    snap = ~fly & (pos[1] <= ground_y)
    new_y = jnp.where(snap, ground_y, pos[1])
    new_vy = jnp.where(snap & (vel[1] < 0.0), 0.0, vel[1])
    return pos.at[1].set(new_y), vel.at[1].set(new_vy)
