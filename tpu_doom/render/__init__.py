"""Software rasterizer replacing the reference's OpenGL pipeline.

Reference: engine/src/renderer.rs + the three GLSL shader pairs in
assets/shaders (static/sky/sprite). The pure-jnp path (raster_jnp) is the
correctness reference; tpu_doom.ops hosts the Pallas TPU kernels.
"""

from .camera import camera_matrices, perspective
from .raster_jnp import render_frames, frames_to_rgb


def render_dispatch(scene, pscene, cfg, state, width, height):
    """Backend dispatch shared by DoomSim.render, rollout and LevelBank:
    the portal (column) path when configured and a portal scene exists,
    the triangle path otherwise. One render path serves every API, like
    the reference's single Renderer system (game/src/game.rs:51-78).

    Batches beyond cfg.render_env_chunk are scanned through the renderer
    in env chunks (one jit, bounded intermediates) so 1024-4096-env
    batches render without exhausting HBM."""
    batch = state.pos.shape[0]
    chunk = int(cfg.render_env_chunk)
    if chunk < 0:  # AUTO, re-swept r5 with the FUSED kernel: 32 on
        # small levels (8905 vs 8501 env-fps at the driver point;
        # 16 -> 8825, 64 -> 8605, non-dividing widths pay padding; the
        # r2-era 8 was tuned for the pre-fusion two-kernel pipeline),
        # but 8 on BIG-seg levels, whose fatter per-chunk intermediates
        # schedule worse wide (:texstress: 1213 at 8 vs 1127 at 32).
        big = (
            pscene is not None and "p1" in pscene
            and pscene["p1"].shape[0]
            + pscene["sprite_center"].shape[0] > 192
        )
        chunk = 8 if big else 32
    if chunk and batch > chunk:
        return _render_chunked(scene, pscene, cfg, state, width, height, chunk)
    return _render_one(scene, pscene, cfg, state, width, height)


def _render_one(scene, pscene, cfg, state, width, height):
    if cfg.raster_backend.startswith("portal") and pscene is not None:
        from .portal import render_frames_portal

        return render_frames_portal(pscene, scene, cfg, state, width, height)
    return render_frames(scene, cfg, state, width, height)


import functools as _functools

import jax as _jax

# Inner chunk-unroll width of the grouped render scan (see
# _render_chunked). Module-level so tests can monkeypatch it down and
# exercise the multi-group scan path without compiling a 32-body
# program.
GROUP_UNROLL = 32


@_functools.partial(
    _jax.jit, static_argnames=("cfg", "width", "height", "chunk")
)
def _render_chunked(scene, pscene, cfg, state, width, height, chunk):
    # One jit around the whole chunk scan: on remote platforms every EAGER
    # op costs a dispatch round-trip, which made the unjitted chunk path
    # ~3x slower than the work itself.
    import jax
    import jax.numpy as jnp

    batch = state.pos.shape[0]
    nchunks = -(-batch // chunk)
    # Inner UNROLL of up to 32 chunks (lax.scan pays per-iteration cost
    # on remote platforms and XLA pipelines independent unrolled chunk
    # programs); an outer lax.scan over groups keeps compile size
    # bounded for 1024-4096-env batches.
    gu = int(getattr(cfg, "render_group_unroll", -1))
    if gu <= 0:  # AUTO: small unroll on big-seg levels -- each unrolled
        # chunk body carries the whole walk+select+gather+kernel
        # pipeline, and at :texstress: scale the 32-body program pushes
        # XLA compile past 20 minutes (group-scan throughput measured
        # flat); small levels keep the full 32-chunk pipeline window.
        big = (
            pscene is not None and "p1" in pscene
            and pscene["p1"].shape[0]
            + pscene["sprite_center"].shape[0] > 192
        )
        gu = 8 if big else GROUP_UNROLL
    inner = min(nchunks, gu)
    ngroups = -(-nchunks // inner)
    pad = ngroups * inner * chunk - batch

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x.reshape((ngroups, inner, chunk) + x.shape[1:])

    st = jax.tree_util.tree_map(prep, state)

    def group(s):
        """s: (inner, chunk, ...) -> (inner*chunk, H, W) frames."""
        outs = [
            _render_one(
                scene, pscene, cfg,
                jax.tree_util.tree_map(lambda x, c=c: x[c], s),
                width, height,
            )
            for c in range(inner)
        ]
        return (
            jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
        )

    if ngroups == 1:
        g = jax.tree_util.tree_map(lambda x: x[0], st)
        idx, cov = group(g)
        return idx[:batch], cov[:batch]

    def body(_, s):
        return None, group(s)

    _, (idx, cov) = jax.lax.scan(body, None, st)
    idx = idx.reshape((ngroups * inner * chunk,) + idx.shape[2:])[:batch]
    cov = cov.reshape((ngroups * inner * chunk,) + cov.shape[2:])[:batch]
    return idx, cov


__all__ = [
    "camera_matrices",
    "perspective",
    "render_frames",
    "render_dispatch",
    "frames_to_rgb",
]
