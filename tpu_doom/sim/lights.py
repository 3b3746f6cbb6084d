"""Sector light-effect waveforms, closed-form in time.

Reference behavior: /root/reference/game/src/lights.rs:33-78
(light_level_at + sin-hash noise + u8 quantization). Pure function of
(light table, time) so it vmaps over (env, light) with no state.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..wad.light import KIND_ALTERNATE, KIND_GLOW, KIND_RANDOM


def _fract(x):
    return x - jnp.floor(x)


def _noise(sync, t):
    """Deterministic sin-hash (ref lights.rs:62-64)."""
    return _fract(1.0 + jnp.sin((sync + t / 1000.0) * 12.9898 + sync * 78.233) * 43758.547)


def light_levels_at(scene, time):
    """Evaluate all light-table entries at scalar `time` -> (L,) f32 in [0,1].

    vmap over envs by passing per-env time."""
    level = scene.light_level
    alt = scene.light_alt
    speed = scene.light_speed
    duration = scene.light_duration
    sync = scene.light_sync
    kind = scene.light_kind

    # Glow: triangle wave between level and alt (ref lights.rs:40-44).
    scale = level - alt
    safe_scale = jnp.where(scale == 0.0, 1.0, scale)
    phase = time * speed / safe_scale
    glow = jnp.abs(0.5 - _fract(phase)) * 2.0 * scale + alt

    # Random (flash/flicker): alt while hash noise below duration.
    random = jnp.where(
        _noise(sync, jnp.floor(time * speed)) < duration, alt, level
    )

    # Alternate (strobe): alt during the duty fraction of each period.
    alternate = jnp.where(
        _fract(time * speed + sync * 3.5435) < duration, alt, level
    )

    out = jnp.where(
        kind == KIND_GLOW,
        glow,
        jnp.where(
            kind == KIND_RANDOM,
            random,
            jnp.where(kind == KIND_ALTERNATE, alternate, level),
        ),
    )
    return out


def light_table_u8(scene, time):
    """Quantized u8 light levels like the reference's mapped buffer texture
    (ref lights.rs:26-30: clamp * 255 truncated)."""
    levels = jnp.clip(light_levels_at(scene, time), 0.0, 1.0)
    return (levels * 255.0).astype(jnp.uint8)
