#!/usr/bin/env python3
"""Driver benchmark: combined step+render FPS per chip.

Runs the synthetic E1M1-like level (no copyrighted WAD exists in this
environment) at 320x200 across a batch of envs with idle actions,
rendering every tick. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the BASELINE.json north star of 10k env*frames/s
per chip.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Persistent compile cache: axon compiles are slow (minutes) but cached.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(tree):
    """Force completion: on the axon platform block_until_ready is a no-op,
    so pull one dependent scalar back to the host instead."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.ravel()[0:1])


def main():
    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    platform = jax.devices()[0].platform
    batch = int(os.environ.get("BENCH_BATCH", "256" if platform != "cpu" else "4"))
    width, height = 320, 200
    ticks = int(os.environ.get("BENCH_TICKS", "32" if platform != "cpu" else "4"))

    # Portal backend: the fastest path on TPU (triangle-count independent;
    # beats the triangle rasterizer even on the tiny synthetic level).
    # BENCH_BACKEND overrides (e.g. "auto" for the triangle/pallas path).
    backend = os.environ.get("BENCH_BACKEND", "portal")
    if platform == "cpu" and backend == "portal":
        backend = "portal_jnp"
    sim = DoomSim(
        GameConfig(
            wad_file=":test:",
            width=width,
            height=height,
            batch_size=batch,
            raster_backend=backend,
            render_env_chunk=int(os.environ.get("BENCH_RENDER_CHUNK", "-1")),
            player=PlayerConfig(clip_substeps=4),
        )
    )
    state = sim.reset(batch)
    # ACTIVE actions, not idle: every env walks forward while turning at
    # a per-env rate, so views diverge and every tick renders different
    # frames (an idle-action benchmark would be trivially gameable).
    # Yaw-only look keeps pitch at zero (the portal fast path; pitched
    # envs are exercised by tests, not the throughput metric).
    import numpy as _np

    acts = sim.null_actions(batch)
    rng = _np.random.default_rng(0)
    acts = acts._replace(
        movement=jax.numpy.asarray(
            _np.tile(_np.array([[0.0, 1.0]], _np.float32), (batch, 1))
        ),
        look=jax.numpy.asarray(
            _np.stack(
                [rng.uniform(-0.05, 0.05, batch).astype(_np.float32),
                 _np.zeros(batch, _np.float32)],
                axis=1,
            )
        ),
    )

    # Chain CHUNK ticks inside one jitted dispatch: the tunnel to this
    # chip costs ~19 ms per dispatch SUBMISSION, which would otherwise
    # bound the loop (a production host pays microseconds). Every tick
    # still steps AND renders; per-tick frames are consumed on-device
    # (checksum) so nothing is dead-code-eliminated.
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    from tpu_doom.sim.step import step as sim_step
    from tpu_doom.render import render_dispatch

    scene, cfg = sim.scene, sim.config
    pscene = sim._get_portal_scene()

    @jax.jit
    def tick_chunk(s, check):
        def body(carry, _):
            s, check = carry
            s = sim_step(scene, cfg, s, acts)
            idx, cov = render_dispatch(
                scene, pscene, cfg, s, width, height
            )
            check = check + jnp.sum(idx.astype(jnp.uint32), dtype=jnp.uint32)
            return (s, check), None

        (s, check), _ = jax.lax.scan(body, (s, check), None, length=chunk)
        return s, check

    import jax.numpy as jnp

    check = jnp.uint32(0)
    # Compile + warmup.
    state, check = tick_chunk(state, check)
    _sync((state, check))

    t0 = time.perf_counter()
    for _ in range(max(ticks // chunk, 1)):
        state, check = tick_chunk(state, check)
    _sync((state, check))
    _sync(state.pos)
    dt = time.perf_counter() - t0

    fps = batch * max(ticks // chunk, 1) * chunk / dt
    print(
        json.dumps(
            {
                "metric": "step+render FPS/chip (320x200, batched synthetic E1M1)",
                "value": round(fps, 1),
                "unit": "env*frames/s",
                "vs_baseline": round(fps / 10000.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
