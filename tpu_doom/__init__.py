"""tpu-doom: a TPU-native, batch-first Doom simulator in JAX/XLA/Pallas.

Brand-new framework with the capabilities of the reference `rust-doom`
(see SURVEY.md): WAD asset loading, BSP level geometry, palette/colormap
lighting, animated & scrolling textures, sector light effects, sky and
sprite rendering, player physics with swept-sphere collision, and
door/lift/exit triggers -- redesigned for TPUs: levels flatten into dense
device arrays, the OpenGL renderer is replaced by a software rasterizer
(pure-jnp reference path + Pallas kernels), and the per-tick game systems
compile into one pure `jax.lax.scan`-able step function so thousands of
worlds step and render in lockstep.

Layering (bottom -> top), mirroring SURVEY.md section 2:
  wad/      host-side NumPy asset & level loading  (ref: wad crate)
  geom/     level geometry compiler -> dense arrays (ref: wad::visitor)
  sim/      pure-JAX game step: physics/triggers/doors/lights (ref: game crate)
  render/   software rasterizer, pure-jnp reference path (ref: engine renderer + GLSL)
  ops/      Pallas TPU kernels for the hot paths
  parallel/ device mesh / sharding utilities (no reference counterpart)
  models/   the DoomSim top-level API (ref: game::Game)
  utils/    config, frame timers, logging
"""

__version__ = "0.1.0"
