"""Top-level simulator API (ref: the `game` crate's Game trait)."""

from .doom_sim import DoomSim

__all__ = ["DoomSim"]
