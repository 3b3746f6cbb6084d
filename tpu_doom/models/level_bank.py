"""LevelBank: mixed-level batches (SURVEY.md section 2 `wad_system` row:
"preflattened per-level device arrays; level switch = index swap", and
section 7.6: padded arrays for mixed Doom1/Doom2 batches).

All levels' arrays are padded to common shapes and stacked along a leading
level axis; the batch is organized as (L, E): L levels x E envs each, and
step/render vmap over the level axis (scene leading axis mapped). Padding
is inert by construction:
  * render triangles pad to (0,0,0) -> degenerate, det=0, culled;
  * collision triangles pad to a distant degenerate point, rejected by the
    behind-plane test;
  * triggers pad to zero-length lines (segment tests never hit);
  * effect defs pad to (trigger 0, object 0, offset 0, speed 1) which
    deactivates in one tick without moving anything.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.builder import LevelArrays
from ..sim.scene import scene_from_arrays
from ..sim.state import SimState, initial_state
from ..sim.step import step as sim_step
from ..render.raster_jnp import render_frames
from ..utils.config import GameConfig


def _pad_to(a: np.ndarray, shape, fill) -> np.ndarray:
    a = np.asarray(a)
    if a.ndim == 0:
        return a
    pads = [(0, s - c) for s, c in zip(shape, a.shape)]
    return np.pad(a, pads, constant_values=fill)


_FILLS = dict(
    static_num_frames=1,
    decor_num_frames=1,
    coll_v0=1e6,
    coll_v1=1e6,
    coll_v2=1e6,
    flats_atlas=255,
    walls_atlas_index=255,
    decor_atlas_index=255,
    sky_index=0,
    eff_speed=1.0,
    combo_atlas=256,  # padded texels read as transparent holes
    bp_cells=-1,
)


def pad_level_arrays(levels: Sequence[LevelArrays]) -> list[LevelArrays]:
    """Pad every array field to the max shape across levels."""
    fields = [
        f.name
        for f in dataclasses.fields(LevelArrays)
        if f.name not in ("name", "num_objects", "tiled_band_size", "start_yaw", "stats", "portal")
    ]
    max_shape = {}
    for name in fields:
        shapes = [getattr(l, name).shape for l in levels]
        max_shape[name] = tuple(max(s[i] for s in shapes) for i in range(len(shapes[0])))
    out = []
    for l in levels:
        kw = {}
        for name in fields:
            a = getattr(l, name)
            fill = _FILLS.get(name, 0)
            kw[name] = _pad_to(a, max_shape[name], fill)
            # Collision normals need unit length even in padding.
            if name == "coll_normal":
                pad_rows = max_shape[name][0] - a.shape[0]
                if pad_rows:
                    kw[name][a.shape[0] :, 1] = 1.0
        out.append(
            dataclasses.replace(
                l,
                **kw,
                num_objects=max(x.num_objects for x in levels),
            )
        )
    return out


class LevelBank:
    """Stacked scenes + per-(level, env) lockstep stepping/rendering."""

    def __init__(self, levels: Sequence[LevelArrays], cfg: GameConfig):
        assert levels, "empty level bank"
        self.cfg = cfg
        padded = pad_level_arrays(levels)
        self.num_objects = padded[0].num_objects
        scenes = [scene_from_arrays(a)[0] for a in padded]
        self.scenes = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *scenes
        )
        self.level_names = [l.name for l in levels]
        self.palettes = np.stack([l.palette for l in padded])
        self._per_level_scenes = scenes

    @property
    def num_levels(self) -> int:
        return len(self.level_names)

    def reset(self, envs_per_level: int) -> SimState:
        """(L, E, ...) stacked initial states."""
        states = [
            initial_state(s, self.num_objects, envs_per_level)
            for s in self._per_level_scenes
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    def step(self, state: SimState, actions) -> SimState:
        """state/actions have leading (L, E) axes."""
        cfg = self.cfg
        return jax.vmap(lambda sc, st, ac: sim_step(sc, cfg, st, ac))(
            self.scenes, state, actions
        )

    def render(self, state: SimState, width=None, height=None):
        cfg = self.cfg
        w = width or cfg.width
        h = height or cfg.height
        return jax.vmap(
            lambda sc, st: render_frames(sc, cfg, st, w, h)
        )(self.scenes, state)
