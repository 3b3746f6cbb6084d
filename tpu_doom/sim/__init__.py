"""Pure-JAX simulation core: the per-tick game systems compiled into one
step function, batched over an env axis.

Reference: the `game` crate's per-tick systems (SURVEY.md section 3.3) --
player physics + swept-sphere collision, triggers, move effects (doors /
lifts), and sector light effects -- re-expressed as pure array math over
(env, ...) so thousands of worlds step in lockstep under jit/scan/pjit.
"""

from .scene import Scene, scene_from_arrays
from .state import SimState, Actions, initial_state, null_actions
from .step import step, step_n

__all__ = [
    "Scene",
    "scene_from_arrays",
    "SimState",
    "Actions",
    "initial_state",
    "null_actions",
    "step",
    "step_n",
]
