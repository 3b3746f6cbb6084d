"""Native loader (C++) vs pure-Python equality tests."""

import numpy as np
import pytest

from tpu_doom.wad import _native
from tpu_doom.wad.image import CorruptImage, Image
from tpu_doom.wad.wadgen import encode_picture

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library unavailable"
)


class TestNativeDecode:
    def test_matches_python(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            h, w = rng.integers(1, 80), rng.integers(1, 80)
            idx = rng.integers(0, 255, size=(h, w)).astype(np.uint8)
            opaque = rng.random((h, w)) > 0.4
            buf = encode_picture(idx, opaque, 3, -2)
            native = Image.from_buffer(buf)
            python = Image._from_buffer_py(buf)
            np.testing.assert_array_equal(native.pixels, python.pixels)
            assert native.x_offset == python.x_offset == 3
            assert native.y_offset == python.y_offset == -2

    def test_corrupt_raises(self):
        with pytest.raises(CorruptImage):
            Image.from_buffer(b"\x10\x00\x10\x00\x00\x00\x00\x00" + b"\xff" * 8)

    def test_blit_matches_python(self):
        rng = np.random.default_rng(8)
        src_pixels = rng.integers(0, 1 << 16, size=(20, 30)).astype(np.uint16)
        for ignore in (True, False):
            for off in ((-5, -7), (0, 0), (10, 5), (25, 15)):
                a = Image.blank(32, 24)
                b = Image.blank(32, 24)
                src = Image(src_pixels.copy())
                a.blit(src, off, ignore)
                # Force the python path for b.
                import tpu_doom.wad._native as n

                saved = n._lib
                n._lib = None
                try:
                    b.blit(src, off, ignore)
                finally:
                    n._lib = saved
                np.testing.assert_array_equal(a.pixels, b.pixels)
