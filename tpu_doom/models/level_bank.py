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
from ..render import render_dispatch
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


def _pad_portal_table(table, max_segs, max_sprites):
    """Pad a PortalTable's seg axis (zero-length segs are never crossed:
    the walk's |denom| >= 1e-12 test rejects them) and its sprite axis
    (zero-half-width billboards are equally degenerate)."""
    import dataclasses as dc

    kw = {}
    for f in dc.fields(table):
        a = getattr(table, f.name)
        if np.ndim(a) == 0:
            kw[f.name] = a
            continue
        n = max_sprites if f.name.startswith("sprite_") else max_segs
        pads = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        kw[f.name] = np.pad(a, pads)
    return dc.replace(table, **kw)


def stack_portal_scenes(padded_levels: Sequence[LevelArrays]):
    """Portal scene pytree with a leading level axis (padded seg + sprite
    counts; the alpha tables share shapes because the combined atlases
    were already padded common)."""
    from ..render.portal import portal_scene_from_table

    max_segs = max(len(l.portal.p1) for l in padded_levels)
    max_sprites = max(len(l.portal.sprite_half) for l in padded_levels)
    pscenes = [
        portal_scene_from_table(
            _pad_portal_table(l.portal, max_segs, max_sprites), l
        )
        for l in padded_levels
    ]
    # Per-level alpha tables can differ in word count (true plane heights
    # differ); pad with zero words -- rows beyond a level's plane height
    # are never addressed by valid masked texels. Likewise the compact
    # texel table (pad rows are never addressed: cbase offsets stay
    # within each level's true table) and the sky texture (sky coords
    # wrap by the level's true combo_dims).
    aw = max(p["alpha_cols"].shape[1] for p in pscenes)
    ts = max(p["tex_i8"].shape[0] for p in pscenes)
    sh = max(p["sky_tex"].shape[0] for p in pscenes)
    sw = max(p["sky_tex"].shape[1] for p in pscenes)
    # Holeless levels omit the hole table (a static render fast path);
    # the stacked bank must share pytree structure across levels, so it
    # is holeless only if EVERY level is -- otherwise holeless members
    # get an all-zero table (equivalent by construction).
    if any("hole_bytes" in p for p in pscenes):
        th = max(
            p["hole_bytes"].shape[0] for p in pscenes if "hole_bytes" in p
        )
        hn = max(
            p["hole_ranges"].shape[0] for p in pscenes
            if "hole_ranges" in p
        )
        for p in pscenes:
            hb = p.get(
                "hole_bytes", jnp.full((1, 128), -128, jnp.int8)
            )
            if hb.shape[0] < th:
                # s8 tables store byte-128: pad -128 = byte 0 = no holes.
                hb = jnp.pad(hb, ((0, th - hb.shape[0]), (0, 0)),
                             constant_values=-128)
            p["hole_bytes"] = hb
            # Holey-cell ranges for the per-tile transparency gate:
            # holeless members get (and padding rows are) inert
            # [-1, -1) ranges no cbase window can intersect.
            hr = p.get(
                "hole_ranges", jnp.full((1, 2), -1.0, jnp.float32)
            )
            if hr.shape[0] < hn:
                hr = jnp.pad(hr, ((0, hn - hr.shape[0]), (0, 0)),
                             constant_values=-1.0)
            p["hole_ranges"] = hr
    # Active-set tables: the cell axis pads with zero-segment cells
    # (cell_nsegs=0 -> the gather copies no blocks and cell_m never
    # selects them) and tex_full pads with dead rows past each level's
    # own +8-row guard (cell_gseg0 row bases stay valid: they index the
    # unmoved prefix).
    tf = max(p["tex_full"].shape[0] for p in pscenes)
    nc = max(p["cell_m"].shape[1] for p in pscenes)
    for p in pscenes:
        a = p["alpha_cols"]
        if a.shape[1] < aw:
            p["alpha_cols"] = jnp.pad(a, ((0, 0), (0, aw - a.shape[1])))
        ti = p["tex_i8"]
        if ti.shape[0] < ts:
            p["tex_i8"] = jnp.pad(ti, ((0, ts - ti.shape[0]), (0, 0)))
        sk = p["sky_tex"]
        if sk.shape != (sh, sw):
            p["sky_tex"] = jnp.pad(
                sk, ((0, sh - sk.shape[0]), (0, sw - sk.shape[1]))
            )
        t = p["tex_full"]
        if t.shape[0] < tf:
            p["tex_full"] = jnp.pad(t, ((0, tf - t.shape[0]), (0, 0)))
        c = p["cell_m"].shape[1]
        if c < nc:
            p["cell_m"] = jnp.pad(p["cell_m"], ((0, 0), (0, nc - c)))
            p["cell_gseg0"] = jnp.pad(p["cell_gseg0"], (0, nc - c))
            p["cell_nsegs"] = jnp.pad(p["cell_nsegs"], (0, nc - c))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pscenes)


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
        self.pscenes = (
            stack_portal_scenes(padded)
            if cfg.raster_backend.startswith("portal")
            else None
        )

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

    def _at(self, tree, l: int):
        return jax.tree_util.tree_map(lambda x: x[l], tree)

    def step(self, state: SimState, actions, scenes=None) -> SimState:
        """state/actions have leading (L, E) axes.

        The level axis is UNROLLED (L is small and static), not vmapped:
        each level runs the exact single-level production path. vmapping
        over levels batched the Pallas collision kernel's grid and turned
        every scene-dependent `lax.cond` into a both-branches select --
        the r3 BENCH_BANK TPU worker fault lived in that configuration.

        `scenes` (optional) lets a jitted caller pass the stacked scene
        pytree as a traced ARGUMENT: closing over self.scenes embeds it
        as HLO constants, and at L=8 with texstress members the
        serialized module exceeds the remote-compile transport limit
        (HTTP 413) -- same constraint as bench.py's scene-as-args."""
        cfg = self.cfg
        scenes = self.scenes if scenes is None else scenes
        outs = [
            sim_step(
                self._at(scenes, l),
                cfg,
                self._at(state, l),
                self._at(actions, l),
            )
            for l in range(self.num_levels)
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    def initial_states(self, envs_per_level: int) -> SimState:
        """(L, E) stacked per-level initial states (the respawn template)."""
        return self.reset(envs_per_level)

    def step_with_exits(self, state: SimState, active, actions,
                        scenes=None):
        """One tick + device-side per-env level exits (ref
        game/src/level.rs:194-199: exit -> next level + full player reset,
        player.rs:119-133 / game_shaders.rs:77-96 reset time).

        Envs occupy (L, E) slots gated by the `active` mask. An env whose
        exit fires respawns at the NEXT level's start in a free slot of
        that level's group (the reference carries nothing across the level
        change, so migration moves no data -- only slot occupancy). If the
        target group is full the env resets in place in its own level
        (documented capacity fallback). Returns (state, active, moved):
        moved[l] = envs that left level l this tick.
        """
        L = self.num_levels
        state = self.step(state, actions, scenes=scenes)
        init = self.initial_states(state.pos.shape[1])

        exited = (state.exit_triggered > 0) & active  # (L, E)
        moved = jnp.zeros_like(exited)
        new_active = active
        for g in range(L if L > 1 else 0):
            src = g - 1 if g > 0 else L - 1  # exits from level g-1 land in g
            incoming = exited[src]  # (E,) envs of level `src` exiting into g
            n_in = jnp.sum(incoming)
            free = ~new_active[g]
            free_rank = jnp.cumsum(free) - 1
            recv = free & (free_rank < n_in)  # first n_in free slots fill
            n_recv = jnp.sum(recv)
            # Deactivate the first n_recv incoming (the rest reset in place).
            in_rank = jnp.cumsum(incoming) - 1
            departed = incoming & (in_rank < n_recv)
            moved = moved.at[src].set(departed)
            new_active = new_active.at[g].set(new_active[g] | recv)
            new_active = new_active.at[src].set(new_active[src] & ~departed)
            # Spawn: receiving slots take level g's initial state.
            spawn = recv

            def put(init_leaf, state_leaf, g=g, spawn=spawn):
                m = spawn.reshape(spawn.shape + (1,) * (state_leaf.ndim - 2))
                return state_leaf.at[g].set(
                    jnp.where(m, init_leaf[g], state_leaf[g])
                )

            state = jax.tree_util.tree_map(put, init, state)

        # Every exited slot resets in place: capacity-blocked envs restart
        # their level; departed slots (now inactive) are left clean.
        reset_here = exited

        def reset_in_place(init_leaf, state_leaf):
            m = reset_here.reshape(
                reset_here.shape + (1,) * (state_leaf.ndim - 2)
            )
            return jnp.where(m, init_leaf, state_leaf)

        state = jax.tree_util.tree_map(reset_in_place, init, state)
        state = state._replace(
            exit_triggered=jnp.zeros_like(state.exit_triggered)
        )
        return state, new_active, moved

    def render(self, state: SimState, width=None, height=None,
               scenes=None, pscenes=None):
        """Render all (L, E) envs through the configured backend (portal
        included: each level's stacked portal tables ride the vmapped
        level axis). `scenes`/`pscenes` may be passed as traced
        arguments by a jitted caller (see step)."""
        cfg = self.cfg
        w = width or cfg.width
        h = height or cfg.height
        scenes = self.scenes if scenes is None else scenes
        pscenes = self.pscenes if pscenes is None else pscenes
        # Unrolled level loop (see step): keeps the portal path's
        # triangle-fallback `lax.cond` a real cond and the fused kernel's
        # grid unbatched -- the vmapped form faulted the TPU worker at
        # config-5 scale (r3 verdict, Missing #1).
        outs = [
            render_dispatch(
                self._at(scenes, l),
                None if pscenes is None else self._at(pscenes, l),
                cfg,
                self._at(state, l),
                w,
                h,
            )
            for l in range(self.num_levels)
        ]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )
