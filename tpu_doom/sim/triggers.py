"""Trigger polling: walk-over / push / switch / gun line activation.

Reference behavior: /root/reference/game/src/level.rs:77-167
(poll_triggers) + math/src/line.rs segment_intersect_offset. Vectorized
over (env, trigger); effect insertion reproduces the reference's
last-writer-wins VecMap insert order by selecting the highest-index fired
effect-def per object.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom.builder import EXIT_NONE

# TRIGGER_TYPE_IDS in geom.builder: Any=0 Push=1 Switch=2 WalkOver=3 Gun=4
T_ANY, T_PUSH, T_SWITCH, T_WALKOVER, T_GUN = 0, 1, 2, 3, 4

PUSH_RANGE = 0.5  # ref level.rs:90
SHOOT_RANGE = 100.0  # ref level.rs:91


def _segment_intersect(ox, oz, dx, dz, length, t_origin, t_displace, t_length):
    """Vectorized Line2::segment_intersect_offset (ref line.rs:45-58):
    does segment (o, d*len) cross each trigger segment?

    (ox, oz, dx, dz, length): scalars for one env's walk/aim line
    (d is unit). t_*: (K,) trigger line tables. Returns (K,) bool."""
    tdx, tdz = t_displace[:, 0], t_displace[:, 1]
    denom = dx * tdz - dz * tdx
    nonpar = jnp.abs(denom) >= 1e-16
    rx = t_origin[:, 0] - ox
    rz = t_origin[:, 1] - oz
    offset = (rx * tdz - rz * tdx) / jnp.where(nonpar, denom, 1.0)
    in_self = (offset >= 0.0) & (offset < length)
    px = ox + dx * offset
    pz = oz + dz * offset
    other = jnp.where(
        jnp.abs(tdx) > jnp.abs(tdz),
        (px - t_origin[:, 0]) / jnp.where(tdx == 0.0, 1.0, tdx),
        (pz - t_origin[:, 1]) / jnp.where(tdz == 0.0, 1.0, tdz),
    )
    in_other = (other >= 0.0) & (other < t_length)
    return nonpar & in_self & in_other


def poll_triggers(scene, px, pz, moved, look_dir, push, shoot):
    """One env (vmapped by the caller): returns the (K,) fired mask.

    (px, pz): player ground position; moved: (3,) displacement this tick
    (vel * dt); look_dir: (3,) look vector; push/shoot: bools."""
    # Walked line: origin = position, displace = -moved.xz (ref level.rs:84).
    wx, wz = -moved[0], -moved[2]
    wlen = jnp.sqrt(wx * wx + wz * wz)
    some_walk = wlen >= 1e-16
    wdx = jnp.where(some_walk, wx / jnp.where(some_walk, wlen, 1.0), 0.0)
    wdz = jnp.where(some_walk, wz / jnp.where(some_walk, wlen, 1.0), 0.0)

    # Aim line for push/shoot (ref level.rs:85-94).
    lx, lz = look_dir[0], look_dir[2]
    lmag = jnp.sqrt(lx * lx + lz * lz)
    ok_look = lmag >= 1e-16
    lxn = jnp.where(ok_look, lx / jnp.where(ok_look, lmag, 1.0), 0.0)
    lzn = jnp.where(ok_look, lz / jnp.where(ok_look, lmag, 1.0), 0.0)
    arange = jnp.where(push, PUSH_RANGE, SHOOT_RANGE)

    walked_hit = _segment_intersect(
        px, pz, wdx, wdz, wlen,
        scene.trig_origin, scene.trig_displace, scene.trig_length,
    )
    aim_hit = _segment_intersect(
        px, pz, lxn, lzn, arange,
        scene.trig_origin, scene.trig_displace, scene.trig_length,
    ) & (push | shoot)

    ttype = scene.trig_type
    fired = jnp.where(
        ttype == T_WALKOVER,
        walked_hit,
        jnp.where(
            (ttype == T_PUSH) | (ttype == T_SWITCH),
            aim_hit & push,
            jnp.where(
                ttype == T_GUN,
                aim_hit & shoot,
                # Any: walk-over OR push (ref level.rs:121-137).
                walked_hit | (aim_hit & push),
            ),
        ),
    )
    return fired


def apply_fired(scene, fired, trig_alive, exit_triggered, eff_state):
    """Consume (K,) fired mask for one env: insert move effects into the
    per-object effect slots (last fired wins, ref level.rs:140-147),
    kill only_once triggers, raise the exit flag. eff_state is a dict of
    (O,) arrays."""
    fired = fired & trig_alive

    # Effect-def firing: (D,) defs, fired if their trigger fired.
    def_fired = fired[scene.eff_trigger]  # (D,)
    D = scene.eff_trigger.shape[0]
    O = eff_state["eff_active"].shape[0]
    if D > 0:
        score = jnp.where(def_fired, jnp.arange(1, D + 1, dtype=jnp.int32), 0)
        # (O, D) one-hot of target object -> best (last) fired def per object.
        onehot = scene.eff_object[None, :] == jnp.arange(O, dtype=jnp.int32)[:, None]
        best = jnp.max(jnp.where(onehot, score[None, :], 0), axis=1)  # (O,)
        has = best > 0
        idx = jnp.maximum(best - 1, 0)
        eff_state = dict(
            eff_active=jnp.where(has, True, eff_state["eff_active"]),
            eff_first=jnp.where(
                has, scene.eff_first_offset[idx], eff_state["eff_first"]
            ),
            eff_second=jnp.where(
                has, scene.eff_second_offset[idx], eff_state["eff_second"]
            ),
            eff_has_second=jnp.where(
                has, scene.eff_has_second[idx], eff_state["eff_has_second"]
            ),
            eff_wait=jnp.where(has, scene.eff_wait[idx], eff_state["eff_wait"]),
            eff_speed=jnp.where(has, scene.eff_speed[idx], eff_state["eff_speed"]),
        )

    trig_alive = trig_alive & ~(fired & scene.trig_only_once)
    # A level may have NO triggers at all (e.g. the stress maze);
    # jnp.max over a zero-size axis has no identity.
    if fired.shape[0] > 0:
        exit_code = jnp.max(jnp.where(fired, scene.trig_exit, EXIT_NONE))
        exit_triggered = jnp.maximum(exit_triggered, exit_code)
    return trig_alive, exit_triggered, eff_state
