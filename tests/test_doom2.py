"""Doom2-format fixture (MAP01): TEXTURE2, secret exit, hanging decor and
18 distinct linedef specials exercising every HeightRef branch of the
LevelAnalysis (ref wad/src/visitor.rs:322-497 + assets/meta/doom.toml
[[linedef]] table; VERDICT r1 item 6).

Expected offsets are HAND-COMPUTED from the map geometry in
wadgen.doom2_map_spec (game units = wad units / 100):
  * hall: floor 0, ceil 128; pockets adjoin ONLY the hall (+ their own
    back cell), so neighbour heights are known by construction.
  * doors (ceil 0): LowestCeiling(128) - 4 = 124 -> +1.24.
  * 40: HighestCeiling over {hall 128, back cell 192} = 192 -> +0.64.
  * 18: NextFloor over {hall 0, back cell 48} = 48 -> +0.48.
  * 36: HighestFloor {hall 0, back 64} + 8 = 72, from floor 96 -> -0.24.
  * 70: HighestFloor {hall 0} + 8 = 8, from floor 32 -> -0.24.
  * lifts (floor 64): LowestFloor(0) -> -0.64, back to Floor -> 0.0.
  * speed: doom.toml speed * 35/4 / 100 (8 -> 0.7, 32 -> 2.8).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.geom.analysis import LevelAnalysis
from tpu_doom.wad.archive import Archive
from tpu_doom.wad.level import LevelData
from tpu_doom.wad.tex import TextureDirectory
from tpu_doom.wad.wadgen import build_doom2_wad


@pytest.fixture(scope="module")
def d2(metadata):
    wad = Archive(build_doom2_wad(), source=":doom2:")
    return wad, metadata


# special -> (trigger, only_once, exit, [(first, second, speed, wait)])
EXPECTED = {
    1: ("Push", False, None, [(1.24, 0.0, 0.7, 4.0)]),
    117: ("Push", False, None, [(1.24, 0.0, 2.8, 4.0)]),
    118: ("Push", True, None, [(1.24, None, 2.8, 0.0)]),
    2: ("WalkOver", True, None, [(1.24, None, 0.7, 0.0)]),
    3: ("WalkOver", True, None, [(-1.28, None, 0.7, 0.0)]),
    103: ("Switch", True, None, [(1.24, None, 0.7, 0.0)]),
    40: ("WalkOver", True, None, [(0.64, None, 0.7, 0.0)]),
    43: ("Switch", False, None, [(-1.28, None, 2.8, 0.0)]),
    70: ("Switch", False, None, [(-0.24, None, 2.8, 0.0)]),
    10: ("WalkOver", True, None, [(-0.64, 0.0, 0.7, 3.0)]),
    62: ("Switch", False, None, [(-0.64, 0.0, 0.7, 3.0)]),
    123: ("Switch", False, None, [(-0.64, 0.0, 2.8, 3.0)]),
    18: ("Switch", True, None, [(0.48, None, 0.7, 0.0)]),
    23: ("Switch", True, None, [(-0.32, None, 0.7, 0.0)]),
    36: ("WalkOver", True, None, [(-0.24, None, 2.8, 0.0)]),
    38: ("WalkOver", True, None, [(-0.32, None, 0.7, 0.0)]),
    58: ("WalkOver", True, None, [(0.24, None, 0.7, 0.0)]),
    11: ("Switch", True, "Normal", []),
    51: ("Switch", True, "Secret", []),
}


class TestDoom2Format:
    def test_map_names_and_sky_regex(self, d2):
        wad, meta = d2
        names = [wad.level_name(i) for i in range(wad.num_levels)]
        assert names[0].startswith(b"MAP01")
        assert names[1].startswith(b"MAP02")
        # doom.toml's Doom2 sky pattern resolves MAPxx names (meta.rs:156-172).
        sky = meta.sky_for(names[0])
        assert sky is not None and sky.texture_name.startswith(b"SKY1")

    def test_texture2_lump_resolves(self, d2):
        wad, meta = d2
        tex = TextureDirectory(wad, meta)
        # BRICK2/EXITSW live in TEXTURE2 only (wad/src/tex.rs TEXTURE1/2).
        assert tex.texture(b"BRICK2\0\0") is not None
        assert tex.texture(b"EXITSW\0\0") is not None

    def test_analysis_tables_match_hand_computed(self, d2):
        wad, meta = d2
        analysis = LevelAnalysis(LevelData(wad, 0), meta)
        seen = {}
        for tr in analysis.triggers:
            if tr.special_type == 48:  # scroll: not a trigger special
                continue
            seen.setdefault(tr.special_type, tr)
        assert sorted(seen) == sorted(EXPECTED), sorted(seen)
        for sp, (trig, once, exit_effect, effs) in EXPECTED.items():
            tr = seen[sp]
            assert tr.trigger_type == trig, sp
            assert tr.only_once == once, sp
            assert tr.exit_effect == exit_effect, sp
            got = [
                (
                    round(e.first_height_offset, 4),
                    None
                    if e.second_height_offset is None
                    else round(e.second_height_offset, 4),
                    round(e.speed, 4),
                    e.wait,
                )
                for e in tr.move_effects
            ]
            assert got == effs, (sp, got)

    def test_every_heightref_branch_covered(self, d2):
        """The fixture instantiates specials whose doom.toml HeightDefs
        collectively reference every HeightRef variant."""
        wad, meta = d2
        refs = set()
        for sp in EXPECTED:
            ld = meta.linedef.get(sp)
            if ld is None or ld.move_effect is None:
                continue
            for eff in (ld.move_effect.floor, ld.move_effect.ceiling):
                if eff is None:
                    continue
                refs.add(eff.first.to)
                if eff.second is not None:
                    refs.add(eff.second.to)
        assert {
            "LowestFloor", "NextFloor", "HighestFloor",
            "LowestCeiling", "HighestCeiling", "Floor",
        } <= refs, refs

    def test_hanging_decor_instantiated(self, d2, metadata):
        wad, meta = d2
        from tpu_doom.geom.builder import compile_level

        tex = TextureDirectory(wad, meta)
        arrays = compile_level(wad, tex, meta, 0)
        # 3 decor things: hanging victim + barrel + candle.
        assert arrays.portal.sprite_half.shape[0] == 3
        # The hanging victim (GOR1, 48 tall at ceiling 1.28) hangs DOWN
        # from the ceiling: high = 1.28, low = 1.28 - 0.48 = 0.80
        # (ref visitor.rs:1062-1137 hanging offset).
        highs = np.sort(arrays.portal.sprite_high)
        assert highs[-1] == pytest.approx(1.28, abs=1e-5)
        lows = arrays.portal.sprite_low[np.argmax(arrays.portal.sprite_high)]
        assert lows == pytest.approx(0.80, abs=1e-5)


class TestDoom2Sim:
    def test_secret_exit_fires_code_2(self):
        from tpu_doom.models import DoomSim
        from tpu_doom.utils.config import GameConfig, PlayerConfig

        sim = DoomSim(
            GameConfig(
                wad_file=":doom2:", width=64, height=40, batch_size=1,
                player=PlayerConfig(clip_substeps=1, enable_noclip=False),
            )
        )
        state = sim.reset(1)
        # Secret switch line at wad (8, 64..128) -> game x -0.64..-1.28,
        # z -0.08 (game x = -wad_y/100, z = -wad_x/100).
        state = state._replace(
            pos=jnp.array([[-0.96, 0.5, -0.3]], jnp.float32),
            yaw=jnp.array([jnp.pi], jnp.float32),  # face +z
        )
        acts = sim.null_actions(1)._replace(push=jnp.array([True]))
        state = sim.step(state, acts)
        assert int(state.exit_triggered[0]) == 2  # Secret

    def test_map01_renders(self):
        from tpu_doom.models import DoomSim
        from tpu_doom.utils.config import GameConfig, PlayerConfig

        sim = DoomSim(
            GameConfig(
                wad_file=":doom2:", width=64, height=40, batch_size=1,
                raster_backend="portal_jnp", portal_crossings=12,
                player=PlayerConfig(clip_substeps=1, enable_noclip=False),
            )
        )
        state = sim.reset(1)
        idx, cov = sim.render(state)
        assert np.asarray(cov).mean() > 0.95
        assert len(np.unique(np.asarray(idx))) > 4
