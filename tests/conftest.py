"""Test configuration: force an 8-device virtual CPU mesh so sharding/DP
tests run without TPU hardware (SURVEY.md section 4).

Note: the axon TPU plugin in this environment overrides the JAX_PLATFORMS
env var at import time, so the platform must be forced through
jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is COMPILE-dominated on the
# single-core CI host (every test config's first render/step pays a
# multi-second XLA compile), and repo checkouts persist across rounds,
# so cached compiles cut repeat suite runs by minutes. Gitignored; a
# cold run just repopulates it.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_wad_bytes():
    from tpu_doom.wad.wadgen import build_test_wad

    return build_test_wad()


@pytest.fixture(scope="session")
def archive(test_wad_bytes):
    from tpu_doom.wad.archive import Archive

    return Archive(test_wad_bytes, source="<synthetic>")


@pytest.fixture(scope="session")
def metadata():
    from tpu_doom.wad.meta import WadMetadata

    return WadMetadata.from_file("assets/meta/doom.toml")


@pytest.fixture(scope="session")
def textures(archive, metadata):
    from tpu_doom.wad.tex import TextureDirectory

    return TextureDirectory(archive, metadata)


@pytest.fixture(scope="session")
def level_data(archive):
    from tpu_doom.wad.level import LevelData

    return LevelData(archive, 0)
