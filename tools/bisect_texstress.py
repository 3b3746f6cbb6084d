#!/usr/bin/env python3
"""Hardware bisect for the :texstress: verify-leg mismatch: run the
compiled portal path against the jnp oracle under a matrix of feature
toggles (select kernel / visible-seg compaction) and report per-pose
mismatch counts, to isolate which new walk feature miscompiles on the
real chip (interpret mode passes everything)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_doom.models import DoomSim  # noqa: E402
from tpu_doom.utils.config import GameConfig, PlayerConfig  # noqa: E402


def _sync(x):
    return np.asarray(x.ravel()[0:1])


def states(sim, b=8):
    rng = np.random.default_rng(7)
    state = sim.reset(b)
    state = state._replace(
        yaw=jnp.asarray(rng.uniform(0, 6.28, b).astype(np.float32)))
    acts = sim.null_actions(b)._replace(
        movement=jnp.asarray(np.tile([[0.0, 1.0]], (b, 1)).astype(np.float32)))
    seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (24,) + x.shape), acts)
    state = sim.step_n(state, seq, 24)
    state = state._replace(pitch=state.pitch.at[1].set(0.3))
    return state


def main():
    base = GameConfig(
        wad_file=":texstress:", width=320, height=200, batch_size=8,
        raster_backend="portal_jnp", render_env_chunk=0,
        player=PlayerConfig(clip_substeps=1),
    )
    sim = DoomSim(base)
    state = states(sim)
    ref_idx, ref_cov = sim.render(state)
    _sync(ref_idx)
    ref_idx, ref_cov = np.asarray(ref_idx), np.asarray(ref_cov)

    variants = {
        "full": {},
        "nosel": {"portal_select_rows": "off"},
        "novis": {"portal_visible_segs": 0},
        "none": {"portal_select_rows": "off", "portal_visible_segs": 0},
    }
    only = sys.argv[1:] or list(variants)
    for name in only:
        kw = variants[name]
        simk = DoomSim(dataclasses.replace(
            base, raster_backend="portal", **kw))
        ik, ck = simk.render(state)
        _sync(ik)
        per = (np.asarray(ik) != ref_idx).reshape(8, -1).sum(axis=1)
        cper = (np.asarray(ck) != ref_cov).reshape(8, -1).sum(axis=1)
        print(f"{name}: px={int(per.sum())} cov={int(cper.sum())} "
              f"per-pose px={per.tolist()} cov={cper.tolist()}", flush=True)


if __name__ == "__main__":
    main()
