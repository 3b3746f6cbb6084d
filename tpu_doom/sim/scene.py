"""Device-resident scene: one level's arrays uploaded once.

The reference re-creates GL buffers per level (game/src/level.rs:424-496);
here a `Scene` is an immutable pytree of jnp arrays produced from
`LevelArrays`. Multi-level banks (padded stacks for mixed-level batches)
build on this in tpu_doom.models.level_bank.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geom.builder import LevelArrays


class Scene(NamedTuple):
    """All per-level device arrays. Every leaf is a jnp array so a Scene can
    be passed through jit/pjit/scan; static shape info rides on the arrays."""

    # static geometry
    static_pos: jnp.ndarray
    static_atlas_uv: jnp.ndarray
    static_tile_uv: jnp.ndarray
    static_tile_size: jnp.ndarray
    static_scroll: jnp.ndarray
    static_row_height: jnp.ndarray
    static_num_frames: jnp.ndarray
    static_light: jnp.ndarray
    static_object: jnp.ndarray
    wall_tris: jnp.ndarray
    wall_tri_transparent: jnp.ndarray
    flat_tris: jnp.ndarray
    # sky
    sky_pos: jnp.ndarray
    sky_object: jnp.ndarray
    sky_tris: jnp.ndarray
    # decor
    decor_pos: jnp.ndarray
    decor_local_x: jnp.ndarray
    decor_atlas_uv: jnp.ndarray
    decor_tile_uv: jnp.ndarray
    decor_tile_size: jnp.ndarray
    decor_num_frames: jnp.ndarray
    decor_light: jnp.ndarray
    decor_object: jnp.ndarray
    decor_tris: jnp.ndarray
    # collision
    coll_v0: jnp.ndarray
    coll_v1: jnp.ndarray
    coll_v2: jnp.ndarray
    coll_normal: jnp.ndarray
    coll_object: jnp.ndarray
    bp_origin: jnp.ndarray
    bp_inv_cell: jnp.ndarray
    bp_dims: jnp.ndarray
    bp_cells: jnp.ndarray
    # triggers / effects
    trig_origin: jnp.ndarray
    trig_displace: jnp.ndarray
    trig_length: jnp.ndarray
    trig_type: jnp.ndarray
    trig_only_once: jnp.ndarray
    trig_exit: jnp.ndarray
    eff_trigger: jnp.ndarray
    eff_object: jnp.ndarray
    eff_first_offset: jnp.ndarray
    eff_second_offset: jnp.ndarray
    eff_has_second: jnp.ndarray
    eff_speed: jnp.ndarray
    eff_wait: jnp.ndarray
    # lights
    light_level: jnp.ndarray
    light_kind: jnp.ndarray
    light_alt: jnp.ndarray
    light_speed: jnp.ndarray
    light_duration: jnp.ndarray
    light_sync: jnp.ndarray
    # textures
    palette: jnp.ndarray
    palette_lut: jnp.ndarray
    colormaps: jnp.ndarray
    walls_atlas_index: jnp.ndarray
    walls_atlas_alpha: jnp.ndarray
    flats_atlas: jnp.ndarray
    decor_atlas_index: jnp.ndarray
    decor_atlas_alpha: jnp.ndarray
    combo_atlas: jnp.ndarray
    combo_dims: jnp.ndarray
    sky_index: jnp.ndarray
    tiled_band_size: jnp.ndarray  # scalar f32
    # start
    start_pos: jnp.ndarray
    start_yaw: jnp.ndarray  # scalar f32

    @property
    def num_triggers(self) -> int:
        return self.trig_origin.shape[0]


def scene_from_arrays(arrays: LevelArrays) -> tuple[Scene, int]:
    """Upload a compiled level; returns (scene, num_objects)."""
    def j(x):
        return jnp.asarray(x)

    scene = Scene(
        static_pos=j(arrays.static_pos),
        static_atlas_uv=j(arrays.static_atlas_uv),
        static_tile_uv=j(arrays.static_tile_uv),
        static_tile_size=j(arrays.static_tile_size),
        static_scroll=j(arrays.static_scroll),
        static_row_height=j(arrays.static_row_height),
        static_num_frames=j(arrays.static_num_frames),
        static_light=j(arrays.static_light),
        static_object=j(arrays.static_object),
        wall_tris=j(arrays.wall_tris),
        wall_tri_transparent=j(arrays.wall_tri_transparent),
        flat_tris=j(arrays.flat_tris),
        sky_pos=j(arrays.sky_pos),
        sky_object=j(arrays.sky_object),
        sky_tris=j(arrays.sky_tris),
        decor_pos=j(arrays.decor_pos),
        decor_local_x=j(arrays.decor_local_x),
        decor_atlas_uv=j(arrays.decor_atlas_uv),
        decor_tile_uv=j(arrays.decor_tile_uv),
        decor_tile_size=j(arrays.decor_tile_size),
        decor_num_frames=j(arrays.decor_num_frames),
        decor_light=j(arrays.decor_light),
        decor_object=j(arrays.decor_object),
        decor_tris=j(arrays.decor_tris),
        coll_v0=j(arrays.coll_v0),
        coll_v1=j(arrays.coll_v1),
        coll_v2=j(arrays.coll_v2),
        coll_normal=j(arrays.coll_normal),
        coll_object=j(arrays.coll_object),
        bp_origin=j(arrays.bp_origin),
        bp_inv_cell=j(arrays.bp_inv_cell),
        bp_dims=j(arrays.bp_dims),
        bp_cells=j(arrays.bp_cells),
        trig_origin=j(arrays.trig_origin),
        trig_displace=j(arrays.trig_displace),
        trig_length=j(arrays.trig_length),
        trig_type=j(arrays.trig_type),
        trig_only_once=j(arrays.trig_only_once),
        trig_exit=j(arrays.trig_exit),
        eff_trigger=j(arrays.eff_trigger),
        eff_object=j(arrays.eff_object),
        eff_first_offset=j(arrays.eff_first_offset),
        eff_second_offset=j(arrays.eff_second_offset),
        eff_has_second=j(arrays.eff_has_second),
        eff_speed=j(arrays.eff_speed),
        eff_wait=j(arrays.eff_wait),
        light_level=j(arrays.light_level),
        light_kind=j(arrays.light_kind),
        light_alt=j(arrays.light_alt),
        light_speed=j(arrays.light_speed),
        light_duration=j(arrays.light_duration),
        light_sync=j(arrays.light_sync),
        palette=j(arrays.palette),
        palette_lut=j(arrays.palette_lut),
        colormaps=j(arrays.colormaps),
        walls_atlas_index=j(arrays.walls_atlas_index),
        walls_atlas_alpha=j(arrays.walls_atlas_alpha),
        flats_atlas=j(arrays.flats_atlas),
        decor_atlas_index=j(arrays.decor_atlas_index),
        decor_atlas_alpha=j(arrays.decor_atlas_alpha),
        combo_atlas=j(arrays.combo_atlas),
        combo_dims=j(arrays.combo_dims),
        sky_index=j(arrays.sky_index),
        tiled_band_size=jnp.float32(arrays.tiled_band_size),
        start_pos=j(arrays.start_pos),
        start_yaw=jnp.float32(arrays.start_yaw),
    )
    return scene, arrays.num_objects
