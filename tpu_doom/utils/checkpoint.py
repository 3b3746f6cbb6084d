"""Checkpoint / resume: the whole sim state is one pytree of arrays.

The reference has no checkpointing (SURVEY.md section 5: all state is
rebuilt from the WAD, the player resets on level change); for batched RL
workloads it matters, and the pytree design makes it trivial: SimState
round-trips through a single .npz.
"""

from __future__ import annotations

import numpy as np

from ..sim.state import SimState


def save_state(path: str, state: SimState, **extra):
    """Write a SimState (+ optional metadata scalars) to an .npz file."""
    arrays = {f"state_{k}": np.asarray(v) for k, v in state._asdict().items()}
    for k, v in extra.items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> tuple[SimState, dict]:
    """Read back (SimState, metadata dict)."""
    import jax.numpy as jnp

    with np.load(path) as data:
        fields = {
            k[len("state_"):]: jnp.asarray(data[k])
            for k in data.files
            if k.startswith("state_")
        }
        meta = {
            k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
        }
    return SimState(**fields), meta
