#!/usr/bin/env python3
"""A/B perf harness: time the fused step+render tick under config tweaks.

Usage: python tools/perfcmp.py key=val [key=val ...] -- runs one timed
config per comma-separated group, e.g.
  python tools/perfcmp.py portal_compact_crossings=8 portal_compact_crossings=4
Each arg group is `field=value[,field=value...]` applied on top of the
bench defaults (B=256, 320x200, active actions, chunk=8 ticks/dispatch).
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


_SIM_CACHE: dict = {}


def _get_sim(cfg):
    """One DoomSim per (wad, shape) across override groups: rebuilding
    re-uploads the scene, and at :texstress: scale the combo-atlas
    host->device transfer alone is ~11 minutes through the tunnel."""
    from tpu_doom.models import DoomSim

    key = (cfg.wad_file, cfg.width, cfg.height)
    if key not in _SIM_CACHE:
        _SIM_CACHE[key] = DoomSim(cfg)
    return _SIM_CACHE[key]


def run_one(overrides: dict) -> float:
    import dataclasses

    from tpu_doom.render import render_dispatch
    from tpu_doom.sim.step import step as sim_step
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    width, height = (
        int(os.environ.get("BENCH_W", "320")),
        int(os.environ.get("BENCH_H", "200")),
    )
    ticks = int(os.environ.get("BENCH_TICKS", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))

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
    sim = _get_sim(cfg)
    state = sim.reset(batch)
    rng = np.random.default_rng(0)
    acts = sim.null_actions(batch)._replace(
        movement=jnp.asarray(np.tile(np.array([[0.0, 1.0]], np.float32),
                                     (batch, 1))),
        look=jnp.asarray(np.stack(
            [rng.uniform(-0.05, 0.05, batch).astype(np.float32),
             np.zeros(batch, np.float32)], axis=1)),
    )
    scene, pscene = sim.scene, sim._get_portal_scene()

    # scene/pscene/acts as jit ARGUMENTS (closed-over arrays embed as
    # HLO constants and break the remote-compile transport at
    # :texstress: scale -- see bench.py).
    @jax.jit
    def tick_chunk(scene, pscene, acts, s, check):
        def body(carry, _):
            s, check = carry
            s = sim_step(scene, cfg, s, acts)
            idx, cov = render_dispatch(scene, pscene, cfg, s, width, height)
            check = check + jnp.sum(idx.astype(jnp.uint32), dtype=jnp.uint32)
            return (s, check), None

        (s, check), _ = jax.lax.scan(
            body, (s, check), None, length=chunk,
            unroll=int(os.environ.get("BENCH_UNROLL", "1")))
        return s, check

    check = jnp.uint32(0)
    state, check = tick_chunk(scene, pscene, acts, state, check)
    _sync((state, check))
    reps = max(ticks // chunk, 1)
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, check = tick_chunk(scene, pscene, acts, state, check)
        _sync((state, check))
        best = min(best, time.perf_counter() - t0)
    return batch * reps * chunk / best


def parse(group: str) -> dict:
    out = {}
    for kv in group.split(","):
        parts = kv.split("=", 1)
        if len(parts) != 2:
            raise SystemExit(
                f"bad override {kv!r}; usage: key=value[,key=value...]")
        k, v = parts
        if v in ("True", "False"):
            out[k] = v == "True"
        else:
            try:
                out[k] = int(v)
            except ValueError:
                try:
                    out[k] = float(v)
                except ValueError:
                    out[k] = v
    return out


def main():
    groups = sys.argv[1:] or [""]
    for g in groups:
        ov = parse(g) if g else {}
        # ENV.KEY=VAL entries set process env vars read at TRACE time
        # (A/B hooks); the jit cache is keyed on config+shapes only, so
        # it must be cleared when any env hook is in play.
        envs = {k[4:]: str(v) for k, v in ov.items()
                if k.startswith("ENV.")}
        ov = {k: v for k, v in ov.items() if not k.startswith("ENV.")}
        if envs:
            for k, v in envs.items():
                os.environ[k] = v
            jax.clear_caches()
        fps = run_one(ov)
        if envs:
            for k in envs:
                os.environ.pop(k, None)
            jax.clear_caches()
        print(f"{g or '(default)'}: {fps:.1f} env-fps", flush=True)


if __name__ == "__main__":
    main()
