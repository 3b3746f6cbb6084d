#!/usr/bin/env python3
"""Minimal hardware repro for the L=8 bank TPU worker fault: a 2-level
bank (:test: + a texstress member) rendered once on the chip, with
feature toggles to bisect which kernel path faults at BANK (padded)
shapes. Usage: bisect_bank.py [variant]; variants: full nosel novis
kc8 act tri"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_doom.geom.builder import compile_level  # noqa: E402
from tpu_doom.models import DoomSim  # noqa: E402
from tpu_doom.models.level_bank import LevelBank  # noqa: E402
from tpu_doom.utils.config import GameConfig, PlayerConfig  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    kw = {
        "full": {},
        "nosel": {"portal_select_rows": "off"},
        "novis": {"portal_visible_segs": 0},
        "none": {"portal_select_rows": "off", "portal_visible_segs": 0},
        "kc8": {"portal_compact_crossings": 8},
        "act": {"portal_global_segs_max": 512},  # force active path
        "tri": {"raster_backend": "auto"},  # triangle path
    }[variant]
    cfg = GameConfig(
        wad_file=":test:", width=320, height=200,
        raster_backend="portal", render_env_chunk=0,
        player=PlayerConfig(clip_substeps=1), **kw,
    )
    sim1 = DoomSim(cfg)
    sim2 = DoomSim(dataclasses.replace(cfg, wad_file=":texstress:4x16"))
    levels = [
        compile_level(sim1.wad, sim1.textures, sim1.metadata, 0),
        compile_level(sim2.wad, sim2.textures, sim2.metadata, 0),
    ]
    bank = LevelBank(levels, cfg)
    E = 2
    state = bank.reset(E)
    rng = np.random.default_rng(3)
    state = state._replace(
        yaw=jnp.asarray(rng.uniform(0, 6.28, (2, E)).astype(np.float32)))

    @jax.jit
    def render(scenes, pscenes, s):
        idx, cov = bank.render(s, 320, 200, scenes=scenes, pscenes=pscenes)
        return jnp.sum(idx.astype(jnp.uint32)), jnp.mean(
            cov.astype(jnp.float32))

    chk, covm = render(bank.scenes, bank.pscenes, state)
    print(f"{variant}: checksum={int(np.asarray(chk.ravel()[0:1])[0])} "
          f"coverage={float(np.asarray(covm.ravel()[0:1])[0]):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
