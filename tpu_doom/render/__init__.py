"""Software rasterizer replacing the reference's OpenGL pipeline.

Reference: engine/src/renderer.rs + the three GLSL shader pairs in
assets/shaders (static/sky/sprite). The pure-jnp path (raster_jnp) is the
correctness reference; tpu_doom.ops hosts the Pallas TPU kernels.
"""

from .camera import camera_matrices, perspective
from .raster_jnp import render_frames, frames_to_rgb

__all__ = ["camera_matrices", "perspective", "render_frames", "frames_to_rgb"]
