"""Phase-2 tests: level analysis, BSP walking, geometry compile."""

import math

import numpy as np
import pytest

from tpu_doom.geom.analysis import LevelAnalysis
from tpu_doom.geom.builder import compile_level
from tpu_doom.geom.lines import Line2
from tpu_doom.geom.walker import LevelVisitor, LevelWalker, points_to_polygon


@pytest.fixture(scope="module")
def analysis(level_data, metadata):
    return LevelAnalysis(level_data, metadata)


@pytest.fixture(scope="module")
def arrays(archive, textures, metadata):
    return compile_level(archive, textures, metadata, 0)


class TestLine2:
    def test_signed_distance_sides(self):
        line = Line2.from_two_points((0.0, 0.0), (1.0, 0.0))
        assert line.signed_distance((0.5, -1.0)) > 0
        assert line.signed_distance((0.5, 1.0)) < 0
        assert line.signed_distance((0.5, 0.0)) == pytest.approx(0.0)

    def test_segment_intersect(self):
        a = Line2.from_two_points((0.0, 0.0), (2.0, 0.0))
        b = Line2.from_two_points((1.0, -1.0), (1.0, 1.0))
        assert a.segment_intersect_offset(b) == pytest.approx(1.0)
        # Beyond either segment end -> None.
        c = Line2.from_two_points((5.0, -1.0), (5.0, 1.0))
        assert a.segment_intersect_offset(c) is None
        d = Line2.from_two_points((1.0, 1.0), (1.0, 3.0))
        assert a.segment_intersect_offset(d) is None


class TestAnalysis:
    def test_objects(self, analysis):
        # door ceiling (1) + lift floor (2), plus static 0.
        assert analysis.num_objects == 3
        assert analysis.ceiling_id(3) == 1
        assert analysis.floor_id(3) == 0
        assert analysis.floor_id(8) == 2

    def test_triggers(self, analysis):
        by_special = {}
        for t in analysis.triggers:
            by_special.setdefault(t.special_type, []).append(t)
        # Two push-door lines, one lift walkover, one exit switch.
        # Scroll special 48 is absent from doom.toml, so the reference
        # creates an unimplemented 'Any' trigger for it alongside the
        # walker's scroll attribute (visitor.rs:446-496 + 922); it is
        # behaviorally inert (no effects, no exit) but present.
        assert len(by_special[1]) == 2
        assert len(by_special[88]) == 1
        assert len(by_special[11]) == 1
        scroll = by_special[48]
        assert all(
            t.unimplemented and t.trigger_type == "Any"
            and not t.move_effects and t.exit_effect is None
            for t in scroll
        )

        door = by_special[1][0]
        assert door.trigger_type == "Push" and not door.only_once
        (eff,) = door.move_effects
        assert eff.object_id == 1
        # Ceiling: LowestCeiling(96) - 4 = 92 above rest height 0 -> +0.92.
        assert eff.first_height_offset == pytest.approx(0.92)
        assert eff.second_height_offset == pytest.approx(0.0)
        assert eff.wait == 4.0
        assert eff.speed == pytest.approx(0.7)

        lift = by_special[88][0]
        (eff,) = lift.move_effects
        assert eff.object_id == 2
        assert eff.first_height_offset == pytest.approx(-0.64)
        assert eff.second_height_offset == pytest.approx(0.0)

        exit_t = by_special[11][0]
        assert exit_t.exit_effect == "Normal" and exit_t.only_once

    def test_ranges(self, analysis):
        fr, cr = analysis.sector_ranges(3)
        assert cr == (0, 92)
        assert fr is None
        fr, cr = analysis.sector_ranges(8)
        assert fr == (-32, 32)


class TestWalker:
    def test_sector_at(self, level_data, analysis, textures, metadata):
        walker = LevelWalker(level_data, analysis, textures, metadata, LevelVisitor())
        # Player start is in sector 0 (WAD (256,256) -> game (-2.56,-2.56)).
        assert walker.sector_at((-2.56, -2.56)) == 0
        # Nukage pool center: WAD (896, 192) -> game (-1.92, -8.96).
        assert walker.sector_at((-1.92, -8.96)) == 6
        # Outside the map.
        assert walker.sector_at((5.0, 5.0)) is None

    def test_event_counts(self, arrays):
        s = arrays.stats
        assert s["decors"] == 2
        assert s["floor_polys"] == 16  # all 16 subsectors have solid floors
        # 9 of the subsectors lie under the sky ceiling.
        assert s["ceil_polys"] + s["sky_ceil_polys"] == 16
        assert s["sky_wall_quads"] > 0

    def test_points_to_polygon_square(self):
        pts = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.5, 0.0)]
        poly = points_to_polygon(pts)
        # Collinear edge point dropped, 4 corners kept (POLY_BIAS-fattened).
        assert len(poly) == 4
        cx = sum(p[0] for p in poly) / 4
        cy = sum(p[1] for p in poly) / 4
        assert (cx, cy) == pytest.approx((0.5, 0.5), abs=1e-4)
        # Corners pushed outward.
        r = math.hypot(poly[0][0] - cx, poly[0][1] - cy)
        assert r > math.hypot(0.5, 0.5)

    def test_points_to_polygon_dedup(self):
        pts = [(0.0, 0.0), (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
        poly = points_to_polygon(pts)
        assert len(poly) == 4


class TestCompiledArrays:
    def test_static_soa_consistent(self, arrays):
        n = len(arrays.static_pos)
        for name in (
            "static_atlas_uv",
            "static_tile_uv",
            "static_tile_size",
            "static_scroll",
            "static_row_height",
            "static_num_frames",
            "static_light",
            "static_object",
        ):
            assert len(getattr(arrays, name)) == n
        assert arrays.wall_tris.max() < n
        assert arrays.flat_tris.max() < n

    def test_scroll_wall_present(self, arrays):
        # The west wall of the start room scrolls at 35 u/s.
        assert (arrays.static_scroll == 35.0).any()

    def test_animated_flat_frames(self, arrays):
        # Nukage floor vertices carry num_frames == 3.
        flat_verts = np.unique(arrays.flat_tris)
        nf = arrays.static_num_frames[flat_verts]
        assert (nf == 3).any()
        assert (nf == 1).any()

    def test_dynamic_objects_in_geometry(self, arrays):
        # Door ceiling object (1) owns some wall vertices (the door face),
        # lift floor object (2) as well.
        assert (arrays.static_object == 1).any()
        assert (arrays.static_object == 2).any()
        assert (arrays.coll_object == 2).any()

    def test_collision_normals_unit(self, arrays):
        norms = np.linalg.norm(arrays.coll_normal, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_collision_floor_exists_under_start(self, arrays):
        # A floor triangle at y=0 near the start position.
        floor = arrays.coll_normal[:, 1] > 0.5
        ys = arrays.coll_v0[floor][:, 1]
        assert (np.abs(ys) < 0.01).any()

    def test_light_table(self, arrays):
        # Deduped: glow + flicker effects present exactly once each.
        from tpu_doom.wad.light import KIND_GLOW, KIND_RANDOM

        assert (arrays.light_kind == KIND_GLOW).sum() == 1
        assert (arrays.light_kind == KIND_RANDOM).sum() == 1
        assert len(arrays.light_level) < 255

    def test_palette_lut(self, arrays):
        assert arrays.palette_lut.shape == (32, 256, 3)
        assert arrays.sky_index.shape == (128, 256)
        assert arrays.tiled_band_size > 0

    def test_decor_quads(self, arrays):
        assert len(arrays.decor_pos) == 8  # 2 decors x 4 verts
        assert len(arrays.decor_tris) == 4
        # Billboard half-widths are symmetric.
        assert arrays.decor_local_x[0] == -arrays.decor_local_x[1]

    def test_grate_in_collision(self, arrays):
        # The impassable grate line contributes vertical collision quads
        # at x == -4.48 (wad y=448..256 -> game x=-4.48..-2.56, z=-10.0).
        zs = arrays.coll_v0[:, 2]
        assert (np.abs(zs + 10.0) < 0.01).any()

    def test_start(self, arrays):
        np.testing.assert_allclose(
            arrays.start_pos, [-2.56, 0.5, -2.24], atol=1e-5
        )
        assert arrays.start_yaw == 0.0
