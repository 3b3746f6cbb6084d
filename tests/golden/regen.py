"""Regenerate golden frames for the regression tests.

Run from the repo root after an INTENTIONAL renderer change:
    python tests/golden/regen.py
and commit the updated .npz. The frames pin the jnp reference renderer's
exact output (palette indices) for fixed scenarios on the synthetic WAD.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def scenarios(sim):
    """(name, state mutation) fixed camera scenarios."""
    base = sim.reset(1)
    yield "start", base
    yield "big_room", base._replace(
        pos=jnp.array([[-2.2, 0.2, -8.8]]), yaw=jnp.array([0.9]),
        pitch=jnp.array([0.3]), time=jnp.array([1.25]),
    )
    yield "door_half_open", base._replace(
        pos=jnp.array([[-2.56, 0.33, -5.4]]),
        object_offset=base.object_offset.at[0, 1].set(0.5),
    )
    yield "grate", base._replace(
        pos=jnp.array([[-3.5, 1.0, -9.0]]), time=jnp.array([0.4])
    )


def main():
    from tpu_doom.models import DoomSim
    from tpu_doom.utils.config import GameConfig

    sim = DoomSim(GameConfig(wad_file=":test:", raster_backend="jnp"))
    out = {}
    for name, state in scenarios(sim):
        idx, cov = sim.render(state, 160, 100)
        out[f"{name}_idx"] = np.asarray(idx[0])
        out[f"{name}_cov"] = np.asarray(cov[0])
    path = os.path.join(os.path.dirname(__file__), "frames.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, "scenarios:", sorted({k.rsplit('_',1)[0] for k in out}))


if __name__ == "__main__":
    main()
