#!/usr/bin/env python3
"""Stage budget at the driver bench point: time partial pipelines.

Usage: python tools/stagebudget.py [stage ...]
Stages: full | step | render | walk | kernel  (default: all)

Every stage runs the SAME shape discipline as bench.py / perfcmp: B=256,
320x200, 8-tick scan chunks inside one jit, checksum-synced. Numbers are
ms per 256-env tick (divide by 4 for a 64-env-equivalent figure).

Overrides ride the environment (BENCH_BATCH/W/H/TICKS/CHUNK/REPS) plus
CFG="key=val,..." config overrides parsed like tools/perfcmp.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.ravel()[0:1])


def main():
    import dataclasses

    from tpu_doom.models import DoomSim
    from tpu_doom.render import render_dispatch
    from tpu_doom.render.portal import _walk_env
    from tpu_doom.sim.step import step as sim_step
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perfcmp import parse

    stages = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "full", "step", "render", "walk"
    ]
    overrides = parse(os.environ["CFG"]) if os.environ.get("CFG") else {}

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    width = int(os.environ.get("BENCH_W", "320"))
    height = int(os.environ.get("BENCH_H", "200"))
    ticks = int(os.environ.get("BENCH_TICKS", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    pfields = {f.name for f in dataclasses.fields(PlayerConfig)}
    pkw, gkw = {}, {}
    for k, v in overrides.items():
        (pkw if k in pfields else gkw)[k] = v
    cfg = GameConfig(
        wad_file=os.environ.get("BENCH_WAD", ":test:"),
        width=width, height=height, batch_size=batch,
        raster_backend="portal",
        player=PlayerConfig(clip_substeps=4, **pkw),
        **gkw,
    )
    sim = DoomSim(cfg)
    state0 = sim.reset(batch)
    rng = np.random.default_rng(0)
    acts = sim.null_actions(batch)._replace(
        movement=jnp.asarray(np.tile(np.array([[0.0, 1.0]], np.float32),
                                     (batch, 1))),
        look=jnp.asarray(np.stack(
            [rng.uniform(-0.05, 0.05, batch).astype(np.float32),
             np.zeros(batch, np.float32)], axis=1)),
    )
    scene, pscene = sim.scene, sim._get_portal_scene()
    env_chunk = 8
    n_cross = int(cfg.portal_crossings)

    # scene/pscene/acts ride as jit ARGUMENTS (closed-over arrays embed
    # as HLO constants -- at :texstress: scale the serialized module
    # exceeds the remote-compile transport limit; see bench.py).
    def body_full(scene, pscene, acts, s, check):
        s = sim_step(scene, cfg, s, acts)
        idx, cov = render_dispatch(scene, pscene, cfg, s, width, height)
        return s, check + jnp.sum(idx.astype(jnp.uint32), dtype=jnp.uint32)

    def body_step(scene, pscene, acts, s, check):
        s = sim_step(scene, cfg, s, acts)
        return s, check + jnp.sum(s.tick.astype(jnp.uint32),
                                  dtype=jnp.uint32)

    def body_render(scene, pscene, acts, s, check):
        # Perturb time so scan iterations cannot be CSE'd into one render.
        s = s._replace(time=s.time + jnp.float32(1.0 / 60.0))
        idx, cov = render_dispatch(scene, pscene, cfg, s, width, height)
        return s, check + jnp.sum(idx.astype(jnp.uint32), dtype=jnp.uint32)

    # Active-set + select-kernel modes engage exactly as
    # _render_portal_zero_pitch does.
    S1 = pscene["tex_i8"].shape[0] if "tex_i8" in pscene else 1 << 30
    cap = int(getattr(cfg, "portal_global_segs_max", 1024))
    act = (
        int(getattr(cfg, "portal_active_segs", 1536))
        if (S1 > cap and "tex_full" in pscene) else 0
    )
    sd = pscene["p1"].shape[0] + pscene["sprite_center"].shape[0]
    sel = "pallas" if sd > 192 else ""

    def walk_chunked(scene, pscene, s):
        """The walk (records materialized, as the render consumes them)
        for all envs in bench-identical 8-env chunks; checksums every
        output so nothing is dead-code-eliminated."""
        total = jnp.float32(0.0)
        for c in range(batch // env_chunk):
            sl = slice(c * env_chunk, (c + 1) * env_chunk)
            records, words, aux = jax.vmap(
                lambda p, y, pi, o, t: _walk_env(
                    pscene, scene, cfg, width, height, n_cross,
                    p, y, pi, o, t, active_segs=act, select_kernel=sel,
                )
            )(s.pos[sl], s.yaw[sl], s.pitch[sl], s.object_offset[sl],
              s.time[sl])
            total = (
                total + jnp.sum(records)
                + jnp.sum(words.astype(jnp.float32))
            )
        return total

    def body_walk(scene, pscene, acts, s, check):
        s = s._replace(time=s.time + jnp.float32(1.0 / 60.0))
        tot = walk_chunked(scene, pscene, s)
        return s, check + tot.astype(jnp.uint32)

    bodies = dict(full=body_full, step=body_step, render=body_render,
                  walk=body_walk)

    results = {}
    for name in stages:
        body = bodies[name]

        @jax.jit
        def tick_chunk(scene, pscene, acts, s, check, body=body):
            def f(carry, _):
                s, check = carry
                return body(scene, pscene, acts, s, check), None

            (s, check), _ = jax.lax.scan(f, (s, check), None, length=chunk)
            return s, check

        state = state0
        check = jnp.uint32(0)
        state, check = tick_chunk(scene, pscene, acts, state, check)
        _sync((state, check))
        nrep = max(ticks // chunk, 1)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(nrep):
                state, check = tick_chunk(scene, pscene, acts, state, check)
            _sync((state, check))
            best = min(best, time.perf_counter() - t0)
        ms = best / (nrep * chunk) * 1000.0
        results[name] = ms
        print(f"{name:>8}: {ms:8.2f} ms/tick (B={batch})  "
              f"[{batch * nrep * chunk / best:.1f} env-fps]", flush=True)

    if "full" in results and "step" in results and "render" in results:
        print(f"  (step+render - full overlap: "
              f"{results['step'] + results['render'] - results['full']:.2f} ms)")


if __name__ == "__main__":
    main()
