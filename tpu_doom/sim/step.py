"""The fused per-tick step function.

Reference: the 19-system update order (SURVEY.md section 3.3); the
game-relevant slice is:
  GameShaders (time += dt) -> Level (move effects animate; lights derive
  from time) -> Player (physics; poll_triggers) -> Renderer.

step() performs exactly that slice, batched over envs; render is a
separate pure function of the state (tpu_doom.render).
"""

from __future__ import annotations

from functools import partial

import jax

from ..utils.config import GameConfig
from .collision import offset_triangles
from .effects import animate_effects
from .player import look_direction, step_player
from .state import Actions, SimState
from .triggers import apply_fired, poll_triggers


def step(scene, cfg: GameConfig, state: SimState, actions: Actions) -> SimState:
    """Advance all envs by one 1/60s tick. Pure; jit/scan/pjit-friendly."""
    dt = cfg.timestep

    # 1. time advances first (ref game_shaders.rs:77-96 runs before Level).
    time = state.time + dt

    # 2. move effects animate door/lift offsets (ref level.rs:202-255).
    eff = animate_effects(state, dt)
    object_offset = eff["object_offset"]

    # 3. fly/clip toggles (ref player.rs:370-376).
    fly = state.fly ^ actions.fly_toggle
    noclip = state.noclip ^ actions.clip_toggle

    # 4. player physics against the offset geometry. The six collision
    # sweeps per env (ground probe, clip substeps, noclip probe) either
    # run inline in XLA or -- on TPU -- fused into one Pallas kernel
    # (ops/collision_pallas.py, bit-identical); the post-sweep math is
    # shared through step_player_with_moves.
    cb = cfg.player.collision_backend
    if cb == "auto":
        cb = (
            "pallas"
            if jax.default_backend() in ("tpu", "axon")
            else "xla"
        )
    use_move_kernel = cfg.player.collision_broadphase and cb in (
        "xla", "pallas", "pallas_interpret"
    )
    if use_move_kernel:
        import jax.numpy as jnp

        from ..ops.collision_pallas import (
            player_move_jnp,
            player_move_pallas,
        )
        from .collision import Contact, broadphase_rows
        from .player import step_player_with_moves

        rows = jax.vmap(
            lambda o, p: broadphase_rows(scene, o, p)
        )(object_offset, state.pos)  # (B, 13, M)
        state8 = jnp.concatenate(
            [state.pos, state.vel,
             jnp.zeros((state.pos.shape[0], 2), jnp.float32)],
            axis=1,
        )
        move_kw = dict(
            radius=cfg.player.radius, height=cfg.player.height, dt=dt,
            substeps=cfg.player.clip_substeps,
            enable_noclip=cfg.player.enable_noclip,
        )
        if cb == "xla":
            # The barriers pin the same materialization boundary the
            # Pallas kernel has, so XLA can't fuse move math with
            # surrounding step ops -- fusion across this boundary
            # perturbs results by ~1 ulp, which flips grounded/jump
            # branches and diverges trajectories from the kernel path.
            rows, state8 = jax.lax.optimization_barrier((rows, state8))
            mv = jax.lax.optimization_barrier(
                player_move_jnp(rows, state8, **move_kw)
            )
        else:
            mv = player_move_pallas(
                rows, state8, interpret=(cb == "pallas_interpret"),
                **move_kw,
            )  # (B, 16)
        ps = jax.vmap(
            lambda g_t, g_n, cp, cv, nt, pos, vel, yaw, pitch, fly_e,
                   noclip_e, lhd, mov, look, jump: step_player_with_moves(
                cfg.player, dt, Contact(time=g_t, normal=g_n), cp, cv, nt,
                pos, vel, yaw, pitch, fly_e, noclip_e, lhd, mov, look,
                jump,
            )
        )(
            mv[:, 0], mv[:, 1:4], mv[:, 4:7], mv[:, 7:10], mv[:, 10],
            state.pos, state.vel, state.yaw, state.pitch, fly, noclip,
            state.last_height_diff, actions.movement, actions.look,
            actions.jump,
        )
    else:
        def one_env(offset_o, pos, vel, yaw, pitch, fly_e, noclip_e, lhd,
                    mov, look, jump):
            if cfg.player.collision_broadphase:
                from .collision import broadphase_triangles

                tris = broadphase_triangles(scene, offset_o, pos)
            else:
                tris3 = offset_triangles(scene, offset_o)
                tris = (*tris3, scene.coll_normal)
            return step_player(
                cfg.player, dt, tris, pos, vel, yaw, pitch, fly_e,
                noclip_e, lhd, mov, look, jump,
            )

        ps = jax.vmap(one_env)(
            object_offset,
            state.pos,
            state.vel,
            state.yaw,
            state.pitch,
            fly,
            noclip,
            state.last_height_diff,
            actions.movement,
            actions.look,
            actions.jump,
        )

    # 5. triggers (ref player.rs:397-407 -> level.rs:77-167). `moved` is
    # velocity * dt with the *post-move* velocity, matching the reference.
    def env_triggers(pos, vel, yaw, pitch, push, shoot, alive, exitc, eff_o):
        moved = vel * dt
        look3 = look_direction(yaw, pitch)
        fired = poll_triggers(
            scene, pos[0], pos[2], moved, look3, push, shoot
        )
        return apply_fired(scene, fired, alive, exitc, eff_o)

    eff_dict = {
        "eff_active": eff["eff_active"],
        "eff_first": eff["eff_first"],
        "eff_second": eff["eff_second"],
        "eff_has_second": eff["eff_has_second"],
        "eff_wait": eff["eff_wait"],
        "eff_speed": eff["eff_speed"],
    }
    trig_alive, exit_triggered, eff_dict = jax.vmap(env_triggers)(
        ps.pos,
        ps.vel,
        ps.yaw,
        ps.pitch,
        actions.push,
        actions.shoot,
        state.trig_alive,
        state.exit_triggered,
        eff_dict,
    )

    return SimState(
        pos=ps.pos,
        vel=ps.vel,
        yaw=ps.yaw,
        pitch=ps.pitch,
        fly=fly,
        noclip=noclip,
        last_height_diff=ps.last_height_diff,
        object_offset=object_offset,
        eff_active=eff_dict["eff_active"],
        eff_first=eff_dict["eff_first"],
        eff_second=eff_dict["eff_second"],
        eff_has_second=eff_dict["eff_has_second"],
        eff_wait=eff_dict["eff_wait"],
        eff_speed=eff_dict["eff_speed"],
        trig_alive=trig_alive,
        exit_triggered=exit_triggered,
        time=time,
        tick=state.tick + 1,
    )


@partial(jax.jit, static_argnames=("cfg", "n"))
def step_n(scene, cfg: GameConfig, state: SimState, action_seq, n: int) -> SimState:
    """Scan n ticks with a (n, B, ...) action sequence (or None for idle),
    donating the carry -- the `lax.scan` lockstep loop that replaces the
    reference's wall-clock tick (SURVEY.md section 2.6 'PP')."""
    if action_seq is None:
        from .state import null_actions

        acts = null_actions(state.pos.shape[0])

        def body(carry, _):
            return step(scene, cfg, carry, acts), None

        out, _ = jax.lax.scan(body, state, None, length=n)
        return out

    def body(carry, a):
        return step(scene, cfg, carry, a), None

    out, _ = jax.lax.scan(body, state, action_seq, length=n)
    return out
