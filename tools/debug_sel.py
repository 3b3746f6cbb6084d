#!/usr/bin/env python3
"""Diff _walk_env intermediates between the select-kernel path and the
einsum path on hardware for one failing :texstress: pose — pinpoints
which intermediate (records / words / gather_meta) the select path
corrupts on the real chip."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_doom.models import DoomSim  # noqa: E402
from tpu_doom.render.portal import _walk_env  # noqa: E402
from tpu_doom.utils.config import GameConfig, PlayerConfig  # noqa: E402


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def main():
    base = GameConfig(
        wad_file=":texstress:", width=320, height=200, batch_size=8,
        raster_backend="portal_jnp", render_env_chunk=0,
        player=PlayerConfig(clip_substeps=1), portal_visible_segs=0,
    )
    sim = DoomSim(base)
    rng = np.random.default_rng(7)
    b = 8
    state = sim.reset(b)
    state = state._replace(
        yaw=jnp.asarray(rng.uniform(0, 6.28, b).astype(np.float32)))
    acts = sim.null_actions(b)._replace(
        movement=jnp.asarray(np.tile([[0.0, 1.0]], (b, 1)).astype(np.float32)))
    seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (24,) + x.shape), acts)
    state = sim.step_n(state, seq, 24)
    state = state._replace(pitch=state.pitch.at[1].set(0.3))

    pscene = sim._get_portal_scene()
    scene = sim.scene
    cfg = sim.config
    act = int(cfg.portal_active_segs)

    @functools.partial(jax.jit, static_argnames=("selk",))
    def walk_all(pscene, scene, state, selk):
        def walk(pos, yaw, pitch, off, t):
            return _walk_env(
                pscene, scene, cfg, 320, 200, int(cfg.portal_crossings),
                pos, yaw, pitch, off, t, active_segs=act,
                select_kernel=selk,
            )
        return jax.vmap(walk)(
            state.pos, state.yaw, state.pitch, state.object_offset,
            state.time)

    r_e, w_e, aux_e = walk_all(pscene, scene, state, "")
    _sync(r_e)
    r_s, w_s, aux_s = walk_all(pscene, scene, state, "pallas")
    _sync(r_s)

    def diff(name, a, b, exact=True):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            n = int((a != b).sum())
        else:
            n = int((a != b).sum())
        print(f"{name}: shape={a.shape} mismatch={n}", flush=True)
        if n:
            w = np.argwhere(a != b)
            print("  first bad:", w[:5].tolist(),
                  "vals a/b:", [(float(a[tuple(i)]), float(b[tuple(i)]))
                                for i in w[:5]], flush=True)
        return n

    diff("records", r_e, r_s)
    diff("words", w_e, w_s)
    for k in sorted(aux_e):
        diff(f"aux[{k}]", aux_e[k], aux_s[k])


if __name__ == "__main__":
    main()
