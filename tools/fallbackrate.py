#!/usr/bin/env python3
"""Measure the portal-path fallback (overflow) rate over the bench
trajectory at SHIPPED defaults (VERDICT r4 weak #2: the default config
must put >=90% of poses on the portal path, with the rate recorded).

Steps B envs with the bench's ACTIVE actions for N ticks and evaluates
_walk_env's aux["overflow"] at every tick. Prints one JSON line."""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_doom.models import DoomSim  # noqa: E402
from tpu_doom.render.portal import _walk_env  # noqa: E402
from tpu_doom.utils.config import GameConfig, PlayerConfig  # noqa: E402


def main():
    wad = os.environ.get("BENCH_WAD", ":texstress:")
    b = int(os.environ.get("BENCH_BATCH", "64"))
    ticks = int(os.environ.get("BENCH_TICKS", "32"))
    sim = DoomSim(GameConfig(
        wad_file=wad, width=320, height=200, batch_size=b,
        raster_backend="portal", player=PlayerConfig(clip_substeps=1),
    ))
    cfg = sim.config
    pscene, scene = sim._get_portal_scene(), sim.scene
    S1 = pscene["tex_i8"].shape[0]
    cap = int(cfg.portal_global_segs_max)
    act = int(cfg.portal_active_segs) if S1 > cap else 0

    rng = np.random.default_rng(0)
    state = sim.reset(b)
    acts = sim.null_actions(b)._replace(
        movement=jnp.asarray(np.tile([[0.0, 1.0]], (b, 1)), jnp.float32),
        look=jnp.asarray(np.stack(
            [rng.uniform(-0.05, 0.05, b).astype(np.float32),
             np.zeros(b, np.float32)], axis=1)),
    )

    @jax.jit
    def probe(pscene, scene, state):
        def walk(pos, yaw, pitch, off, t):
            _, _, aux = _walk_env(
                pscene, scene, cfg, 320, 200, int(cfg.portal_crossings),
                pos, yaw, pitch, off, t, active_segs=act,
            )
            return aux["overflow"]
        return jax.vmap(walk)(
            state.pos, state.yaw, state.pitch, state.object_offset,
            state.time)

    total = over = 0
    for t in range(ticks):
        ov = np.asarray(probe(pscene, scene, state))
        over += int(ov.sum())
        total += ov.size
        state = sim.step(state, acts)
    print(json.dumps({
        "wad": wad, "envs": b, "ticks": ticks,
        "fallback_rate": round(over / max(total, 1), 4),
        "portal_rate": round(1 - over / max(total, 1), 4),
    }))


if __name__ == "__main__":
    main()
