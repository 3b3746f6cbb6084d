"""Move-effect animation: doors/lifts sliding between height offsets.

Reference behavior: /root/reference/game/src/level.rs:202-255 -- per active
effect, per tick: move the object's height offset toward `first` at `speed`;
on arrival consume `wait`; then promote `second` to `first` (if any) and
continue within the same tick; remove when done.

The reference's inner `loop` can cross several phases in one tick; the
phase graph (move -> wait -> promote -> move -> wait -> done) is fully
covered by 3 unrolled masked passes, since `wait` is only nonzero before
the first promotion.
"""

from __future__ import annotations

import jax.numpy as jnp


def animate_effects(state, timestep: float):
    """Advance all active effects by one tick; returns updated state fields
    (object_offset, eff_*) as a dict."""
    offset = state.object_offset
    active = state.eff_active
    first = state.eff_first
    second = state.eff_second
    has_second = state.eff_has_second
    wait = state.eff_wait
    speed = state.eff_speed
    budget = jnp.where(active, jnp.float32(timestep), 0.0)

    done = jnp.zeros_like(active)
    for _ in range(3):  # phase unroll (see module docstring)
        # -- move toward first ------------------------------------------
        run = active & ~done
        needs_move = run & (first != offset)
        diff = first - offset
        sign = jnp.sign(diff)
        time_to_target = jnp.abs(diff) / jnp.maximum(speed, 1e-30)
        partial = needs_move & (time_to_target > budget)
        offset = jnp.where(
            needs_move,
            jnp.where(partial, offset + sign * speed * budget, first),
            offset,
        )
        budget = jnp.where(
            needs_move & ~partial, budget - time_to_target, budget
        )
        stalled = partial  # out of budget mid-move: stop for this tick
        run = run & ~stalled

        # -- wait ---------------------------------------------------------
        wait_blocks = run & (wait > budget)
        wait = jnp.where(wait_blocks, wait - budget, wait)
        budget = jnp.where(run & ~wait_blocks, budget - wait, budget)
        wait = jnp.where(run & ~wait_blocks, 0.0, wait)
        run = run & ~wait_blocks

        # -- promote second, or finish -----------------------------------
        promote = run & has_second
        first = jnp.where(promote, second, first)
        has_second = jnp.where(promote, False, has_second)
        finished = run & ~promote
        active = jnp.where(finished, False, active)
        done = done | stalled | wait_blocks | finished

    return dict(
        object_offset=offset,
        eff_active=active,
        eff_first=first,
        eff_second=second,
        eff_has_second=has_second,
        eff_wait=wait,
        eff_speed=speed,
    )
