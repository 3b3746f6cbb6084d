"""Pallas TPU kernels for the hot render ops.

The jnp reference implementations live in tpu_doom.render; kernels here
must produce bit-identical outputs (tests pin them against each other).
"""

from .raster_pallas import depth_peel_pallas, pack_triangle_rows

__all__ = ["depth_peel_pallas", "pack_triangle_rows"]
