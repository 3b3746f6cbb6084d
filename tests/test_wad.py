"""Phase-1 tests: WAD parsing, names, images, textures, metadata, lights.

Mirrors + extends the reference's unit coverage (SURVEY.md section 4):
wad name parsing (ref wad/src/name.rs:163-190), metadata parse
(ref wad/src/meta.rs:261-358), plus decoder/atlas/light coverage the
reference lacks.
"""

import numpy as np
import pytest

from tpu_doom.wad import types as T
from tpu_doom.wad.image import Image
from tpu_doom.wad.light import (
    KIND_ALTERNATE,
    KIND_GLOW,
    KIND_NONE,
    KIND_RANDOM,
    light_info_for_sector,
    light_to_f32,
    with_contrast,
)
from tpu_doom.wad.meta import WadMetadata
from tpu_doom.wad.name import BadWadName, is_sky_flat, is_untextured, wad_name
from tpu_doom.wad.wadgen import encode_picture


class TestWadName:
    def test_padding_and_upper(self):
        assert wad_name(b"e1m1") == b"E1M1\0\0\0\0"
        assert wad_name("Doom") == b"DOOM\0\0\0\0"
        assert wad_name(b"lousy") == b"LOUSY\0\0\0"

    def test_nul_truncation(self):
        assert wad_name(b"abc\0defg") == b"ABC\0\0\0\0\0"
        assert wad_name(b"full8chr") == b"FULL8CHR"

    def test_rejects(self):
        with pytest.raises(BadWadName):
            wad_name(b"too long name")
        with pytest.raises(BadWadName):
            wad_name(b"space in")
        with pytest.raises(BadWadName):
            wad_name(b"\xfb")

    def test_predicates(self):
        assert is_untextured(b"-\0\0\0\0\0\0\0")
        assert not is_untextured(b"WALL1\0\0\0")
        assert is_sky_flat(b"F_SKY1\0\0")
        assert not is_sky_flat(b"F_SKY2\0\0")


class TestArchive:
    def test_header_and_levels(self, archive):
        assert archive.num_levels == 2
        assert archive.level_name(0) == b"E1M1\0\0\0\0"
        assert archive.level_name(1) == b"E1M2\0\0\0\0"

    def test_lump_lookup(self, archive):
        assert archive.index_of(b"PLAYPAL") is not None
        assert archive.index_of(b"NOPE") is None
        assert len(archive.required_lump_bytes(b"PLAYPAL")) % 768 == 0

    def test_rejects_bad_header(self):
        from tpu_doom.wad.archive import Archive, CorruptWad

        with pytest.raises(CorruptWad):
            Archive(b"PWAD" + b"\0" * 100)


class TestLevelData:
    def test_tables_nonempty(self, level_data):
        assert len(level_data.things) == 3
        assert len(level_data.sectors) == 10
        assert len(level_data.nodes) > 0
        assert len(level_data.subsectors) > 0
        # Every subsector's segs front a single sector.
        for ss in level_data.subsectors:
            segs = level_data.ssector_segs(ss)
            secs = {level_data.seg_sector_id(s) for s in segs}
            assert len(secs) == 1

    def test_bsp_children_reachable(self, level_data):
        # Walk the tree: every subsector must be visited exactly once.
        seen = []
        stack = [len(level_data.nodes) - 1 | 0]

        def visit(child):
            idx, is_leaf = T.parse_child_id(child)
            if is_leaf:
                seen.append(int(idx))
            else:
                node = level_data.nodes[int(idx)]
                visit(int(node["left"]))
                visit(int(node["right"]))

        root = level_data.nodes[-1]
        visit(int(root["left"]))
        visit(int(root["right"]))
        assert sorted(seen) == list(range(len(level_data.subsectors)))

    def test_neighbour_heights(self, level_data):
        # Door sector (3) neighbours are the two corridors (96 ceilings).
        nh = level_data.neighbour_heights(3)
        assert nh.lowest_ceiling == 96
        assert nh.highest_ceiling == 96
        assert nh.lowest_floor == 0
        # Lift (8) neighbours: big room floor -32 and ledge floor 32.
        nh = level_data.neighbour_heights(8)
        assert nh.lowest_floor == -32
        assert nh.highest_floor == 32

    def test_sector_min_light(self, level_data):
        # Flicker sector (7, light 192) borders the big room (144).
        assert level_data.sector_min_light(7) == 144

    def test_min_max_height(self, level_data):
        lo, hi = level_data.min_max_height()
        assert lo == -48 - 512
        assert hi == 192 + 512


class TestImage:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 255, size=(33, 17)).astype(np.uint8)
        opaque = rng.random((33, 17)) > 0.3
        img = Image.from_buffer(encode_picture(idx, opaque, 5, -3))
        got_idx, got_opaque = img.to_index_alpha()
        assert img.x_offset == 5 and img.y_offset == -3
        np.testing.assert_array_equal(got_opaque, opaque)
        np.testing.assert_array_equal(got_idx[opaque], idx[opaque])

    def test_blit_transparency(self):
        base = Image.blank(4, 4)
        src_idx = np.array([[1, 2], [3, 4]], dtype=np.uint8)
        src = Image.from_buffer(
            encode_picture(src_idx, np.array([[True, False], [True, True]]))
        )
        base.blit(src, (1, 1), ignore_transparency=False)
        idx, opaque = base.to_index_alpha()
        assert opaque[1, 1] and idx[1, 1] == 1
        assert not opaque[1, 2]  # transparent source pixel skipped
        assert opaque[2, 2] and idx[2, 2] == 4

    def test_blit_clipping(self):
        base = Image.blank(4, 4)
        src = Image(np.zeros((8, 8), dtype=np.uint16))
        base.blit(src, (-2, -2), ignore_transparency=True)
        _, opaque = base.to_index_alpha()
        assert opaque.all()


class TestTextureDirectory:
    def test_palette_colormap(self, textures):
        assert textures.palettes.shape == (1, 256, 3)
        assert textures.colormaps.shape == (34, 256)
        lut = textures.build_palette_texture(0, 0, 32)
        assert lut.shape == (32, 256, 3)
        # Grayscale palette: row 0 is identity, rows darken monotonically.
        np.testing.assert_array_equal(lut[0, :, 0], np.arange(256))
        assert lut[16, 200, 0] == (200 * 16) // 32

    def test_composite_textures(self, textures):
        wall = textures.texture(b"WALL1\0\0\0")
        assert wall is not None and wall.size == (64, 128)
        sky = textures.texture(b"SKY1\0\0\0\0")
        assert sky is not None and sky.size == (256, 128)
        grate = textures.texture(b"GRATE1\0\0")
        _, opaque = grate.to_index_alpha()
        assert opaque.any() and (~opaque).any()  # transparent columns

    def test_sprites(self, textures):
        assert textures.texture(b"BAR1A0\0\0") is not None
        assert textures.texture(b"CANDA0\0\0") is not None

    def test_flats(self, textures):
        assert textures.flat(b"FLOOR1\0\0") is not None
        assert len(textures.flat(b"NUKAGE1\0")) == 64 * 64

    def test_flat_atlas(self, textures):
        atlas, bounds = textures.build_flat_atlas(
            [b"FLOOR1\0\0", b"CEIL1\0\0\0", b"NUKAGE1\0"]
        )
        # NUKAGE1 is animated: all 3 frames enter the atlas contiguously.
        assert b"NUKAGE3\0" in bounds
        assert bounds[b"NUKAGE1\0"].num_frames == 3
        assert bounds[b"FLOOR1\0\0"].size == (64.0, 64.0)
        # The atlas contains the flat pixels at the recorded position.
        b0 = bounds[b"FLOOR1\0\0"]
        x, y = int(b0.pos[0]), int(b0.pos[1])
        np.testing.assert_array_equal(
            atlas[y : y + 64, x : x + 64].ravel(), textures.flat(b"FLOOR1\0\0")
        )

    def test_texture_atlas(self, textures):
        atlas, bounds = textures.build_texture_atlas(
            [b"WALL1\0\0\0", b"WALL2\0\0\0", b"DOOR1\0\0\0"]
        )
        assert atlas.width % 2 == 0 and atlas.width >= 64
        b0 = bounds[b"WALL1\0\0\0"]
        x, y = int(b0.pos[0]), int(b0.pos[1])
        ref_idx, _ = textures.texture(b"WALL1\0\0\0").to_index_alpha()
        got_idx, _ = atlas.to_index_alpha()
        np.testing.assert_array_equal(got_idx[y : y + 128, x : x + 64], ref_idx)


class TestMetadata:
    def test_parse_doom_toml(self, metadata):
        assert metadata.sky_for(b"E1M1\0\0\0\0").texture_name == b"SKY1\0\0\0\0"
        barrel = metadata.find_thing(2035)
        assert barrel.sprite == b"BAR1\0\0\0\0" and barrel.sequence == "AB"
        door = metadata.linedef[1]
        assert door.trigger == "Push"
        assert door.move_effect.ceiling.first.to == "LowestCeiling"
        assert door.move_effect.ceiling.first.offset == -4
        assert door.move_effect.wait == 4.0
        assert door.move_effect.speed == pytest.approx(8 / 8 * 0.7)
        exit_ld = metadata.linedef[11]
        assert exit_ld.exit_effect == "Normal" and exit_ld.only_once
        lift = metadata.linedef[88]
        assert lift.trigger == "WalkOver"
        assert lift.move_effect.floor.first.to == "LowestFloor"

    def test_embedded_text(self):
        meta = WadMetadata.from_text(
            """
            [[sky]]
                level_pattern = "MAP(0[1-9]|10|11)"
                texture_name = "SKY1"
                tiled_band_size = 0.15
            [animations]
                flats = [["NUKAGE1", "NUKAGE2", "NUKAGE3"], []]
                walls = [[], ["DBRAIN1", "DBRAIN2"]]
            [things]
                [[things.decorations]]
                    thing_type = 10
                    radius = 16
                    sprite = "PLAY"
                    sequence = "W"
                    hanging = false
            """
        )
        assert meta.sky_for(b"MAP05\0\0\0").texture_name == b"SKY1\0\0\0\0"
        assert meta.animated_flats[0][2] == b"NUKAGE3\0"
        assert meta.find_thing(10).radius == 16
        assert meta.find_thing(9999) is None


class TestLights:
    def test_plain_sector(self, level_data):
        info = light_info_for_sector(level_data, 0)
        assert info.kind == KIND_NONE
        assert info.level == pytest.approx(light_to_f32(160))

    def test_glow(self, level_data):
        info = light_info_for_sector(level_data, 1)  # glow alcove, light 224
        assert info.kind == KIND_GLOW
        assert info.alt_level == pytest.approx(light_to_f32(160))
        assert info.sync == 0.0

    def test_flicker(self, level_data):
        info = light_info_for_sector(level_data, 7)
        assert info.kind == KIND_RANDOM
        assert info.speed == 8.0 and info.duration == 0.5
        assert info.sync != 0.0

    def test_strobe_constants(self):
        from tpu_doom.wad import light as L

        assert (L.SLOW_STROBE_SPEED, L.SLOW_STROBE_DURATION) == (1.0, 0.85)
        assert (L.FAST_STROBE_SPEED, L.FAST_STROBE_DURATION) == (2.0, 0.7)

    def test_contrast(self):
        from tpu_doom.wad.light import LightInfo

        info = LightInfo(level=0.5)
        assert with_contrast(info, True).level == pytest.approx(0.5 + 2 / 31)
        assert with_contrast(info, False).level == pytest.approx(0.5 - 2 / 31)
        assert with_contrast(LightInfo(level=0.99), True).level == 1.0


class TestAlternateStrobe:
    def test_same_light_no_effect(self, level_data):
        # A special sector whose min-adjacent light equals its own light
        # gets no effect (ref light.rs:33-38). Sector 7's light differs so
        # it has one; simulate equality via with_contrast-free check on
        # sector 0 (type 0).
        info = light_info_for_sector(level_data, 0)
        assert not info.has_effect
