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


def _verify_test_leg(width=320, height=200):
    """One verify leg on the :test: fixture at (width, height): render
    feature-covering poses through the COMPILED TPU kernels (the
    production fused classify+shade path) and diff bit-for-bit against
    the pure-jnp oracle running on the SAME device."""
    import dataclasses

    import jax.numpy as jnp

    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    base = GameConfig(
        wad_file=":test:", width=width, height=height, batch_size=8,
        raster_backend="portal_jnp", portal_crossings=12,
        render_env_chunk=0, player=PlayerConfig(clip_substeps=1),
    )
    sim = DoomSim(base)
    # Feature-covering poses (walls/flats/sky/door/lift/sprite/masked
    # middle/scroll/pitch shear), mirrors tests/test_portal.py POSES.
    poses = [
        ([-2.56, 0.5, -2.24], 0.0, 0.0, 0.0, 0.0, 0.0),
        ([-2.56, 0.33, -5.4], 0.0, 0.4, 0.5, 0.0, 0.0),
        ([-2.2, 0.2, -8.8], 0.9, 1.25, 0.0, 0.0, 0.0),
        ([-3.5, 1.0, -9.0], 0.0, 0.4, 0.0, 0.0, 0.0),
        ([-3.8, 0.0, -9.8], 0.0, 0.0, 0.0, 0.0, 0.0),
        ([-2.56, 0.2, -12.0], 0.0, 0.0, 0.0, -0.64, 0.0),
        ([-2.56, 0.33, -2.5], 3.14159, 0.5, 0.0, 0.0, 0.0),
        ([-2.2, 0.2, -8.8], 0.9, 1.25, 0.0, 0.0, -0.35),
    ]
    state = sim.reset(len(poses))
    state = state._replace(
        pos=jnp.asarray([p[0] for p in poses], jnp.float32),
        yaw=jnp.asarray([p[1] for p in poses], jnp.float32),
        time=jnp.asarray([p[2] for p in poses], jnp.float32),
        pitch=jnp.asarray([p[5] or 1e-8 for p in poses], jnp.float32),
    )
    oo = np.zeros((len(poses), state.object_offset.shape[1]), np.float32)
    for i, p in enumerate(poses):
        if oo.shape[1] > 2:
            oo[i, 1], oo[i, 2] = p[3], p[4]
    state = state._replace(object_offset=jnp.asarray(oo))

    ref_idx, ref_cov = sim.render(state)
    _sync(ref_idx)
    ref_idx, ref_cov = np.asarray(ref_idx), np.asarray(ref_cov)

    simk = DoomSim(dataclasses.replace(base, raster_backend="portal"))
    ik, ck = simk.render(state)
    _sync(ik)
    mism = int((np.asarray(ik) != ref_idx).sum())
    cmism = int((np.asarray(ck) != ref_cov).sum())
    return {"poses": len(poses), "mismatch_px": mism,
            "mismatch_cov": cmism, "pass": mism <= 16 and cmism <= 16}


def _verify_texstress_leg(kc=0, cap=None):
    """Active-set leg: the :texstress: fixture's compact table exceeds
    portal_global_segs_max, so the compiled path runs gather_cells_pallas
    + the SMEM-planned gated per-env lookup -- the configuration the r3
    verify never touched on hardware. States come from stepping forward
    through the maze (spread positions/yaws), oracle is portal_jnp.

    With no kc override the leg runs the SHIPPED default (AUTO: crossing
    compaction off on deep levels, visible-seg compaction on), i.e. the
    production texstress configuration including the ROLLED classify
    loop (n_rec=120 > ROLL_CLASSIFY_ABOVE). kc=8 (the texstress8 leg)
    forces the small-level compaction budget, exercising the
    compaction + triangle-fallback blend against the big tables."""
    import dataclasses

    import jax.numpy as jnp

    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    extra = {"portal_compact_crossings": kc} if kc else {}
    if cap is not None:  # force a texture path (None = shipped default)
        extra["portal_global_segs_max"] = cap
    base = GameConfig(
        wad_file=":texstress:", width=320, height=200, batch_size=8,
        raster_backend="portal_jnp", render_env_chunk=0,
        player=PlayerConfig(clip_substeps=1), **extra,
    )
    sim = DoomSim(base)
    b = 8
    rng = np.random.default_rng(7)
    state = sim.reset(b)
    state = state._replace(
        yaw=jnp.asarray(rng.uniform(0, 6.28, b).astype(np.float32)))
    acts = sim.null_actions(b)._replace(
        movement=jnp.asarray(np.tile([[0.0, 1.0]], (b, 1)).astype(np.float32)))
    seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (24,) + x.shape), acts)
    state = sim.step_n(state, seq, 24)
    # One pitched env exercises the shear path against the big tables.
    state = state._replace(
        pitch=state.pitch.at[1].set(0.3))
    ref_idx, ref_cov = sim.render(state)
    _sync(ref_idx)
    ref_idx, ref_cov = np.asarray(ref_idx), np.asarray(ref_cov)

    simk = DoomSim(dataclasses.replace(base, raster_backend="portal"))
    ik, ck = simk.render(state)
    _sync(ik)
    mism = int((np.asarray(ik) != ref_idx).sum())
    cmism = int((np.asarray(ck) != ref_cov).sum())
    return {"poses": b, "mismatch_px": mism, "mismatch_cov": cmism,
            "pass": mism <= 16 and cmism <= 16}


def _verify_bank_leg():
    """LevelBank leg: mixed :test:/:doom2: levels rendered through the
    bank's padded stacked tables, compiled kernels vs the jnp oracle on
    the SAME padded tables (isolates kernel correctness at bank shapes)."""
    import dataclasses

    import jax.numpy as jnp

    from tpu_doom.geom.builder import compile_level
    from tpu_doom.models import DoomSim
    from tpu_doom.models.level_bank import LevelBank
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    cfg = GameConfig(
        wad_file=":test:", width=320, height=200,
        raster_backend="portal", render_env_chunk=0,
        player=PlayerConfig(clip_substeps=1),
    )
    sim1 = DoomSim(cfg)
    sim2 = DoomSim(dataclasses.replace(cfg, wad_file=":doom2:"))
    levels = [
        compile_level(sim1.wad, sim1.textures, sim1.metadata, 0),
        compile_level(sim2.wad, sim2.textures, sim2.metadata, 0),
    ]
    bank = LevelBank(levels, cfg)
    bank_jnp = LevelBank(
        levels, dataclasses.replace(cfg, raster_backend="portal_jnp"))
    E = 4
    state = bank.reset(E)
    rng = np.random.default_rng(3)
    state = state._replace(
        yaw=jnp.asarray(rng.uniform(0, 6.28, (2, E)).astype(np.float32)))
    ref_idx, ref_cov = bank_jnp.render(state)
    _sync(ref_idx)
    ik, ck = bank.render(state)
    _sync(ik)
    mism = int((np.asarray(ik) != np.asarray(ref_idx)).sum())
    cmism = int((np.asarray(ck) != np.asarray(ref_cov)).sum())
    return {"poses": 2 * E, "mismatch_px": mism, "mismatch_cov": cmism,
            "pass": mism <= 16 and cmism <= 16}


def verify():
    """On-device kernel verification (VERDICT r2 #4/#5, r3 #4): every
    production kernel configuration diffs compiled-TPU output against
    the pure-jnp oracle on the SAME device. Legs: the driver point
    (320x200 global table), 640x400 (tile_h AUTO=40 tiling), texstress
    (active-set gather + planned gated lookup), bank (padded mixed-level
    tables). Prints one JSON line; exit 1 on any leg failing.

    (The r2 incarnation of this check caught the walk-fused kernel
    miscompiling on real hardware -- ~50% wrong pixels while
    interpret-mode equality held -- which led to its removal. Pinned
    ceiling: compiled Mosaic vs jnp oracle may differ by a handful of
    fp-tie pixels at span boundaries -- the compiled f32 pipeline
    contracts mul+add to FMA where the oracle does not; anything beyond
    16 px per leg is a real miscompile.)"""
    legs = os.environ.get(
        "BENCH_VERIFY_LEGS",
        "test,640x400,texstress,texstress_act,texstress8,bank").split(",")
    runners = {
        "test": _verify_test_leg,
        "640x400": lambda: _verify_test_leg(640, 400),
        # Shipped defaults: big-table levels ride the plan-gated GLOBAL
        # int8 lookup since the r5 cap raise.
        "texstress": _verify_texstress_leg,
        # Forced ACTIVE-SET path (gather + per-env bf16 tables): the
        # beyond-VMEM configuration, kept hardware-covered even though
        # defaults no longer select it at :texstress: scale.
        "texstress_act": lambda: _verify_texstress_leg(cap=1024),
        "texstress8": lambda: _verify_texstress_leg(8),
        "texstress24": lambda: _verify_texstress_leg(24),
        "bank": _verify_bank_leg,
    }
    out = {"metric": "on-device kernel verification",
           "device": jax.devices()[0].platform, "legs": {}}
    ok = True
    for leg in legs:
        res = runners[leg.strip()]()
        out["legs"][leg.strip()] = res
        ok = ok and res["pass"]
    out["pass"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


def bank_main():
    """BENCH_BANK=1: BASELINE.json config 5 -- 4096 envs spread across
    mixed Doom1/Doom2-format levels at 640x400 through the LevelBank
    (L, E) path with device-side per-env exit migration every tick."""
    import dataclasses

    import jax.numpy as jnp

    from tpu_doom.geom.builder import compile_level
    from tpu_doom.models import DoomSim
    from tpu_doom.models.level_bank import LevelBank
    from tpu_doom.sim.state import null_actions
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    platform = jax.devices()[0].platform
    on_dev = platform != "cpu"
    batch = int(os.environ.get("BENCH_BATCH", "4096" if on_dev else "8"))
    width = int(os.environ.get("BENCH_W", "640"))
    height = int(os.environ.get("BENCH_H", "400"))
    ticks = int(os.environ.get("BENCH_TICKS", "16" if on_dev else "2"))
    n_levels_default = int(os.environ.get("BENCH_LEVELS", "4"))
    # L>4 banks run 2-tick scan chunks: the L=8 program at scan length
    # >= 4 reproducibly CRASHES the axon TPU worker at the full 8x512
    # env scale (ticks/chunk 16/8 and 16/4 crash; 4/2 and 16/2 complete
    # -- a runtime scale limit of the worker, not a state-dependent
    # kernel bug, since 24 simulated ticks pass at scan length 2).
    chunk = int(os.environ.get(
        "BENCH_CHUNK",
        ("8" if n_levels_default <= 4 else "2") if on_dev else "2"))
    backend = os.environ.get("BENCH_BACKEND",
                             "portal" if on_dev else "portal_jnp")

    cfg = GameConfig(
        wad_file=":test:", width=width, height=height,
        raster_backend=backend,
        render_env_chunk=int(os.environ.get("BENCH_RENDER_CHUNK", "-1")),
        player=PlayerConfig(clip_substeps=4),
    )
    # Mixed Doom1 + Doom2 fixture levels (config 5 says "mixed
    # Doom1/Doom2 levels"): E1M1, E1M2, MAP01, MAP02. BENCH_LEVELS=8
    # widens the bank to the real-product shape: + two stress mazes and
    # two texstress mazes, whose padded tables put the whole bank on the
    # big-level render path (gated global texel lookup at stacked
    # shapes).
    n_levels = n_levels_default
    t0 = time.perf_counter()
    sim1 = DoomSim(cfg)
    sim2 = DoomSim(dataclasses.replace(cfg, wad_file=":doom2:"))
    levels = [
        compile_level(sim1.wad, sim1.textures, sim1.metadata, i)
        for i in range(2)
    ] + [
        compile_level(sim2.wad, sim2.textures, sim2.metadata, i)
        for i in range(2)
    ]
    if n_levels > 4:
        extra_wads = [":stress:4", ":stress:6", ":texstress:4x16",
                      ":texstress:6x24"][: n_levels - 4]
        for wadname in extra_wads:
            simx = DoomSim(dataclasses.replace(cfg, wad_file=wadname))
            levels.append(
                compile_level(simx.wad, simx.textures, simx.metadata, 0)
            )
    level_build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    bank = LevelBank(levels, cfg)
    bank_stack_s = time.perf_counter() - t0
    L = bank.num_levels
    E = max(batch // L, 1)
    state = bank.reset(E)
    active = jnp.ones((L, E), bool)

    rng = np.random.default_rng(0)
    acts = null_actions(L * E)
    acts = acts._replace(
        movement=jnp.asarray(
            np.tile(np.array([[0.0, 1.0]], np.float32), (L * E, 1))),
        look=jnp.asarray(np.stack(
            [rng.uniform(-0.05, 0.05, L * E).astype(np.float32),
             np.zeros(L * E, np.float32)], axis=1)),
        push=jnp.asarray(rng.random(L * E) < 0.05),
    )
    acts = jax.tree_util.tree_map(
        lambda x: x.reshape((L, E) + x.shape[1:]), acts)

    # Stacked scenes/pscenes ride as jit ARGUMENTS: closed over, the L=8
    # bank's padded atlases embed as HLO constants and the serialized
    # module exceeds the remote-compile transport limit (HTTP 413).
    from tpu_doom.render import render_dispatch

    @jax.jit
    def tick_chunk(scenes, pscenes, acts, s, act, check):
        def body(carry, _):
            s, act, check = carry
            s, act, _ = bank.step_with_exits(s, act, acts, scenes=scenes)
            # Per-level render + IMMEDIATE checksum reduce: stacking all
            # L levels' frames first keeps L x (E, H, W) f32 frame pairs
            # live at once -- 8.4 GB at the L=8 config-5 scale, which
            # crashed the TPU worker; reducing each level's frames as
            # they are produced bounds live framebuffer memory to one
            # level's worth.
            for l in range(bank.num_levels):
                at = lambda t, l=l: jax.tree_util.tree_map(
                    lambda x: x[l], t)
                idx, cov = render_dispatch(
                    at(scenes), None if pscenes is None else at(pscenes),
                    bank.cfg, at(s), width, height)
                check = check + jnp.sum(
                    idx.astype(jnp.uint32), dtype=jnp.uint32)
            return (s, act, check), None

        (s, act, check), _ = jax.lax.scan(
            body, (s, act, check), None, length=chunk)
        return s, act, check

    check = jnp.uint32(0)
    t0 = time.perf_counter()
    state, active, check = tick_chunk(
        bank.scenes, bank.pscenes, acts, state, active, check)
    _sync((state, check))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    nrep = max(ticks // chunk, 1)
    for _ in range(nrep):
        state, active, check = tick_chunk(
            bank.scenes, bank.pscenes, acts, state, active, check)
    _sync((state, check))
    dt = time.perf_counter() - t0
    fps = L * E * nrep * chunk / dt
    print(
        f"bank timings: level_build {level_build_s:.1f}s, "
        f"stack {bank_stack_s:.1f}s, trace+compile+warmup "
        f"{compile_s:.1f}s (L={L})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"step+render FPS/chip ({width}x{height}, "
                  f"{L}x{E} mixed-level LevelBank)",
        "value": round(fps, 1),
        "unit": "env*frames/s",
        "vs_baseline": round(fps / 10000.0, 4),
    }))
    return 0


def main():
    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig, PlayerConfig

    platform = jax.devices()[0].platform
    batch = int(os.environ.get("BENCH_BATCH", "256" if platform != "cpu" else "4"))
    width = int(os.environ.get("BENCH_W", "320"))
    height = int(os.environ.get("BENCH_H", "200"))
    ticks = int(os.environ.get("BENCH_TICKS", "32" if platform != "cpu" else "4"))

    # Portal backend: the fastest path on TPU (triangle-count independent;
    # beats the triangle rasterizer even on the tiny synthetic level).
    # BENCH_BACKEND overrides (e.g. "auto" for the triangle/pallas path).
    backend = os.environ.get("BENCH_BACKEND", "portal")
    if platform == "cpu" and backend == "portal":
        backend = "portal_jnp"
    # BENCH_WAD overrides the fixture (e.g. ":texstress:" for the
    # real-texel-volume point where the active-set texture path engages;
    # ":stress:" for the many-sector maze).
    wad = os.environ.get("BENCH_WAD", ":test:")
    extra = {}
    if "BENCH_ACTIVE_SEGS" in os.environ:  # active-set budget sweep
        extra["portal_active_segs"] = int(os.environ["BENCH_ACTIVE_SEGS"])
    if "BENCH_CROSSINGS" in os.environ:
        extra["portal_crossings"] = int(os.environ["BENCH_CROSSINGS"])
    if "BENCH_COMPACT" in os.environ:  # kernel crossing-compaction budget
        extra["portal_compact_crossings"] = int(os.environ["BENCH_COMPACT"])
    if "BENCH_GLOBAL_MAX" in os.environ:  # global-table cap (A/B: the
        # SMEM-plan-gated global lookup vs the active-set gather path)
        extra["portal_global_segs_max"] = int(os.environ["BENCH_GLOBAL_MAX"])
    if "BENCH_SELECT" in os.environ:  # walk attribute-select backend
        extra["portal_select_rows"] = os.environ["BENCH_SELECT"]
    if "BENCH_VISIBLE" in os.environ:  # visible-seg compaction budget
        extra["portal_visible_segs"] = int(os.environ["BENCH_VISIBLE"])
    if "BENCH_GROUP_UNROLL" in os.environ:  # chunks unrolled per group
        extra["render_group_unroll"] = int(os.environ["BENCH_GROUP_UNROLL"])
    sim = DoomSim(
        GameConfig(
            wad_file=wad,
            width=width,
            height=height,
            batch_size=batch,
            raster_backend=backend,
            render_env_chunk=int(os.environ.get("BENCH_RENDER_CHUNK", "-1")),
            player=PlayerConfig(clip_substeps=4),
            **extra,
        )
    )
    state = sim.reset(batch)
    # ACTIVE actions, not idle: every env walks forward while turning at
    # a per-env rate, so views diverge and every tick renders different
    # frames (an idle-action benchmark would be trivially gameable).
    # BENCH_LOOKY=1 adds a per-env PITCH rate too (free look rides the
    # portal y-shear path; same-speed-class by design -- see
    # PERFORMANCE.md). The default metric keeps yaw-only look for
    # comparability with r1/r2 numbers.
    import numpy as _np

    acts = sim.null_actions(batch)
    rng = _np.random.default_rng(0)
    looky = os.environ.get("BENCH_LOOKY", "0") == "1"
    pitch_rate = (
        rng.uniform(-0.03, 0.03, batch).astype(_np.float32)
        if looky else _np.zeros(batch, _np.float32)
    )
    acts = acts._replace(
        movement=jax.numpy.asarray(
            _np.tile(_np.array([[0.0, 1.0]], _np.float32), (batch, 1))
        ),
        look=jax.numpy.asarray(
            _np.stack(
                [rng.uniform(-0.05, 0.05, batch).astype(_np.float32),
                 pitch_rate],
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
    # Scan unroll across the tick chain: unrolled tick bodies let XLA's
    # scheduler overlap tick t's render kernel with tick t+1's sim step
    # and record walk (they only depend on state, not frames). lax.scan
    # iterations never overlap.
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    from tpu_doom.sim.step import step as sim_step
    from tpu_doom.render import render_dispatch

    scene, cfg = sim.scene, sim.config
    pscene = sim._get_portal_scene()

    # scene/pscene/acts ride as jit ARGUMENTS: closed-over arrays embed
    # as HLO constants, and at :texstress: scale the 500+ MB module
    # exceeds the remote-compile transport limit (HTTP 413).
    # BENCH_SCENE_CONST=1 closes over them instead (constant folding
    # A/B; only viable on small fixtures).
    scene_const = os.environ.get("BENCH_SCENE_CONST", "0") == "1"

    def tick_body(scene, pscene, acts, carry, _):
        s, check = carry
        s = sim_step(scene, cfg, s, acts)
        idx, cov = render_dispatch(scene, pscene, cfg, s, width, height)
        check = check + jnp.sum(idx.astype(jnp.uint32), dtype=jnp.uint32)
        return (s, check), None

    if scene_const:
        @jax.jit
        def tick_chunk(_scene, _pscene, _acts, s, check):
            (s, check), _ = jax.lax.scan(
                lambda c, x: tick_body(scene, pscene, acts, c, x),
                (s, check), None, length=chunk, unroll=unroll)
            return s, check
    else:
        @jax.jit
        def tick_chunk(scene, pscene, acts, s, check):
            (s, check), _ = jax.lax.scan(
                lambda c, x: tick_body(scene, pscene, acts, c, x),
                (s, check), None, length=chunk, unroll=unroll)
            return s, check

    import jax.numpy as jnp

    check = jnp.uint32(0)
    # Compile + warmup.
    state, check = tick_chunk(scene, pscene, acts, state, check)
    _sync((state, check))

    t0 = time.perf_counter()
    for _ in range(max(ticks // chunk, 1)):
        state, check = tick_chunk(scene, pscene, acts, state, check)
    _sync((state, check))
    _sync(state.pos)
    dt = time.perf_counter() - t0

    fps = batch * max(ticks // chunk, 1) * chunk / dt
    print(
        json.dumps(
            {
                "metric": (
                    "step+render FPS/chip (320x200, batched synthetic E1M1)"
                    if (wad, width, height) == (":test:", 320, 200)
                    else f"step+render FPS/chip ({width}x{height}, "
                         f"batched {wad})"
                ),
                "value": round(fps, 1),
                "unit": "env*frames/s",
                "vs_baseline": round(fps / 10000.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    if "--verify" in sys.argv:
        sys.exit(verify())
    elif os.environ.get("BENCH_BANK", "0") == "1":
        sys.exit(bank_main())
    else:
        sys.exit(main())
