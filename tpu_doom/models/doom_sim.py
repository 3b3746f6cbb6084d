"""DoomSim: the user-facing simulator.

Reference API surface (game/src/game.rs:18-34, SURVEY.md section 7.5):
`create(config)`, `num_levels`, `load_level`, plus the batch-first
additions: `reset`, `step`, `render`, `step_n`, `rollout`.

WAD in; framebuffers + player state out. The special wad_file value
":test:" builds the synthetic fixture IWAD (no copyrighted WAD ships with
or exists in this environment).
"""

from __future__ import annotations

import logging
import time as _time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.builder import LevelArrays, compile_level
from ..render import render_dispatch
from ..render.raster_jnp import frames_to_rgb
from ..sim.scene import Scene, scene_from_arrays
from ..sim.state import Actions, SimState, initial_state, null_actions
from ..sim.step import step as sim_step
from ..utils.config import GameConfig
from ..wad.archive import Archive
from ..wad.meta import WadMetadata
from ..wad.tex import TextureDirectory

log = logging.getLogger(__name__)


class DoomSim:
    """One loaded level, batched lockstep simulation + rendering."""

    def __init__(self, config: GameConfig):
        self.config = config
        t0 = _time.time()
        if config.wad_file == ":test:":
            from ..wad.wadgen import build_test_wad

            self.wad = Archive(build_test_wad(), source=":test:")
        elif config.wad_file == ":doom2:":
            from ..wad.wadgen import build_doom2_wad

            self.wad = Archive(build_doom2_wad(), source=":doom2:")
        elif config.wad_file.startswith(":stress:"):
            # ":stress:" or ":stress:<cells>" -- procedurally generated
            # many-sector level approximating real-WAD scale.
            from ..wad.wadgen import build_stress_wad

            spec = config.wad_file[len(":stress:"):]
            cells = int(spec) if spec else 20
            self.wad = Archive(
                build_stress_wad(0, cells), source=config.wad_file)
        elif config.wad_file.startswith(":texstress:"):
            # ":texstress:" or ":texstress:<cells>x<textures>" -- the
            # stress maze carrying a real-WAD-volume texture pool
            # (n distinct 64x128 wall textures + n/8 flats cycled across
            # sectors), so the compact texel table far exceeds the
            # global-path cap and the per-env active-cell path engages.
            from ..wad.wadgen import build_stress_wad

            spec = config.wad_file[len(":texstress:"):]
            cells, ntex = 16, 128
            if spec:
                c, _, t = spec.partition("x")
                cells, ntex = int(c or cells), int(t or ntex)
            self.wad = Archive(
                build_stress_wad(0, cells, n_textures=ntex),
                source=config.wad_file)
        else:
            self.wad = Archive.open(config.wad_file)
        self.metadata = WadMetadata.from_file(config.metadata_file)
        self.textures = TextureDirectory(self.wad, self.metadata)
        log.info("assets loaded in %.2fs", _time.time() - t0)

        self.level_index: int = -1
        self.arrays: Optional[LevelArrays] = None
        self.scene: Optional[Scene] = None
        self.num_objects: int = 1
        self._step_jit = None
        self._level_cache: dict[int, tuple[LevelArrays, Scene, int]] = {}
        self.load_level(config.initial_level_index)

    # -- level management (ref game.rs:118-129 + wad_system.rs) ----------

    @property
    def num_levels(self) -> int:
        return self.wad.num_levels

    def list_levels(self) -> list[bytes]:
        return [self.wad.level_name(i) for i in range(self.wad.num_levels)]

    def load_level(self, index: int):
        """Compile + upload a level (cached); resets nothing by itself --
        call reset() for fresh states (the reference resets the player on
        level change, player.rs:119-133)."""
        index = index % max(self.num_levels, 1)
        if index == self.level_index:
            return
        if index not in self._level_cache:
            t0 = _time.time()
            arrays = compile_level(self.wad, self.textures, self.metadata, index)
            scene, num_objects = scene_from_arrays(arrays)
            self._level_cache[index] = (arrays, scene, num_objects)
            log.info(
                "level %r compiled+uploaded in %.2fs",
                arrays.name,
                _time.time() - t0,
            )
        self.arrays, self.scene, self.num_objects = self._level_cache[index]
        self.level_index = index
        self._step_jit = None
        self._portal_scene = None
        self._step_render_jit = {}

    # -- simulation --------------------------------------------------------

    def reset(self, batch: Optional[int] = None) -> SimState:
        batch = batch or self.config.batch_size
        return initial_state(self.scene, self.num_objects, batch)

    def null_actions(self, batch: Optional[int] = None) -> Actions:
        return null_actions(batch or self.config.batch_size)

    def step(self, state: SimState, actions: Actions) -> SimState:
        if self._step_jit is None:
            cfg = self.config
            # Scene rides as a jit ARGUMENT, not a closure: closed-over
            # arrays embed as HLO constants, and at real-WAD texel volume
            # (:texstress:) the 500+ MB module breaks the remote-compile
            # transport. Arguments stay device-resident parameters.
            self._step_jit = jax.jit(
                lambda sc, s, a: sim_step(sc, cfg, s, a)
            )
        return self._step_jit(self.scene, state, actions)

    def step_n(self, state: SimState, action_seq, n: int) -> SimState:
        from ..sim.step import step_n

        return step_n(self.scene, self.config, state, action_seq, n)

    def step_render(self, state: SimState, actions: Actions,
                    width=None, height=None):
        """One fused jitted tick: step + render in a single dispatch
        (remote platforms pay ~ms per dispatch; benchmarks and tight
        interactive loops should use this). Returns (state, idx, cov)."""
        w = width or self.config.width
        h = height or self.config.height
        key = (w, h)
        if key not in self._step_render_jit:
            cfg = self.config

            @jax.jit
            def f(scene, pscene, s, a):
                # scene/pscene as args, not closures (see step()).
                s = sim_step(scene, cfg, s, a)
                idx, cov = render_dispatch(scene, pscene, cfg, s, w, h)
                return s, idx, cov

            self._step_render_jit[key] = f
        return self._step_render_jit[key](
            self.scene, self._get_portal_scene(), state, actions
        )

    def rollout(self, state: SimState, action_seq, n: int, *,
                width=None, height=None, render_every: int = 1):
        """Scan n ticks rendering every `render_every`-th frame on-device:
        the scripted-flythrough / RL trajectory mode (one dispatch, zero
        host round-trips). Returns (final_state, frames (F, B, H, W) u8).
        Renders through the configured raster_backend (portal included).

        action_seq: (n, B, ...) Actions pytree or None for idle ticks."""
        w = width or self.config.width
        h = height or self.config.height
        cfg = self.config

        if action_seq is None:
            action_seq = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape),
                null_actions(state.pos.shape[0]),
            )

        # scene/pscene as jit args, not closures (see step()).
        @partial(jax.jit, static_argnames=())
        def run(scene, pscene, state, action_seq):
            def body(carry, a):
                carry = sim_step(scene, cfg, carry, a)
                frames, _ = render_dispatch(scene, pscene, cfg, carry, w, h)
                return carry, frames

            def body_skip(carry, a):
                carry = sim_step(scene, cfg, carry, a)
                return carry, None

            if render_every == 1:
                return jax.lax.scan(body, state, action_seq)
            # Chunk ticks so one frame is rendered per chunk; the trailing
            # n % render_every ticks are stepped (unrendered) afterwards so
            # all n ticks always advance.
            nchunks, rem = divmod(n, render_every)
            chunks = jax.tree_util.tree_map(
                lambda x: x[: nchunks * render_every].reshape(
                    (nchunks, render_every) + x.shape[1:]
                ),
                action_seq,
            )

            def chunk_body(carry, a_chunk):
                carry, _ = jax.lax.scan(body_skip, carry, a_chunk)
                frames, _ = render_dispatch(scene, pscene, cfg, carry, w, h)
                return carry, frames

            state, frames = jax.lax.scan(chunk_body, state, chunks)
            if rem:
                tail = jax.tree_util.tree_map(
                    lambda x: x[nchunks * render_every:], action_seq
                )
                state, _ = jax.lax.scan(body_skip, state, tail)
            return state, frames

        return run(self.scene, self._get_portal_scene(), state, action_seq)

    # -- rendering --------------------------------------------------------

    def _get_portal_scene(self):
        """Portal tables for the current level (None on triangle backends)."""
        if not self.config.raster_backend.startswith("portal"):
            return None
        if self._portal_scene is None:
            from ..render.portal import portal_scene_from_table

            self._portal_scene = portal_scene_from_table(
                self.arrays.portal, self.arrays
            )
        return self._portal_scene

    def render(self, state: SimState, width=None, height=None):
        """(indices (B,H,W) u8, covered (B,H,W) bool)."""
        w = width or self.config.width
        h = height or self.config.height
        return render_dispatch(
            self.scene, self._get_portal_scene(), self.config, state, w, h
        )

    def render_rgb(self, state: SimState, width=None, height=None) -> np.ndarray:
        idx, cov = self.render(state, width, height)
        # np.array (not asarray): owned writable buffer so overlays
        # (utils.text.draw_hud) can stamp into it.
        return np.array(frames_to_rgb(self.arrays.palette, idx, cov))

    # -- convenience -------------------------------------------------------

    def reset_exited(self, state: SimState) -> SimState:
        """Device-side per-env exit handling: envs whose exit fired restart
        THIS level in place (ref level.rs:194-199 + player reset
        player.rs:119-133); every other env is untouched. The single-level
        analogue of LevelBank.step_with_exits' reset_in_place (no
        migration). Jit-safe -- use this in batched RL loops instead of
        handle_exits."""
        exited = state.exit_triggered > 0
        init = initial_state(self.scene, self.num_objects, state.pos.shape[0])

        def sel(i, s):
            m = exited.reshape(exited.shape + (1,) * (s.ndim - 1))
            return jnp.where(m, i, s)

        return jax.tree_util.tree_map(sel, init, state)

    def handle_exits(self, state: SimState) -> SimState:
        """Host-side level-exit handling for interactive/single-env flows
        (ref level.rs:194-199: exit -> next level + player reset). Resets
        the WHOLE batch onto the next level; for per-env in-place resets
        in batch mode use reset_exited."""
        exits = np.asarray(state.exit_triggered)
        if exits.any():
            self.load_level(self.level_index + 1)
            state = self.reset(exits.shape[0])
        return state

    def check(self) -> float:
        """Load + compile every level (ref `check` subcommand,
        src/main.rs:101-115); returns elapsed seconds."""
        t0 = _time.time()
        current = self.level_index
        for i in range(self.num_levels):
            self.load_level(i)
        self.load_level(current)
        return _time.time() - t0
