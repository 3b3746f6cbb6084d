"""Golden-frame regression tests: the renderer's exact palette-index
output for fixed scenarios (SURVEY.md section 4: golden-framebuffer
tests). Regenerate intentionally with `python tests/golden/regen.py`."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "frames.npz")


@pytest.fixture(scope="module")
def sim():
    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig

    return DoomSim(GameConfig(wad_file=":test:", raster_backend="jnp"))


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as data:
        return {k: data[k] for k in data.files}


def _scenario_states(sim):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    from regen import scenarios

    return list(scenarios(sim))


def test_golden_frames(sim, golden):
    for name, state in _scenario_states(sim):
        idx, cov = sim.render(state, 160, 100)
        got_idx = np.asarray(idx[0])
        got_cov = np.asarray(cov[0])
        want_idx = golden[f"{name}_idx"]
        want_cov = golden[f"{name}_cov"]
        np.testing.assert_array_equal(got_cov, want_cov, err_msg=name)
        diff = (got_idx != want_idx).mean()
        assert diff == 0.0, f"{name}: {diff:.5f} of pixels differ"


def test_golden_pallas_interpret(sim, golden):
    """The Pallas kernel path must hit the same goldens."""
    import dataclasses

    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig

    psim = DoomSim(GameConfig(wad_file=":test:", raster_backend="pallas_interpret"))
    for name, state in _scenario_states(psim):
        if name != "grate":  # one scenario suffices (slow in interpret mode)
            continue
        idx, cov = psim.render(state, 160, 100)
        np.testing.assert_array_equal(
            np.asarray(idx[0]), golden[f"{name}_idx"], err_msg=name
        )
