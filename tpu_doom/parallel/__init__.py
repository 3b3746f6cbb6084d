"""Device-mesh scaling: the env axis is data-parallel over chips.

No reference counterpart (the reference is single-process/single-GPU,
SURVEY.md section 2.6); this is where the TPU build scales: envs shard
over the 'dp' mesh axis, the framebuffer row axis can shard over 'tp',
and the only cross-chip traffic is metric reductions.
"""

from .mesh import (
    make_mesh,
    shard_sim,
    shard_batch_pytree,
    replicate_pytree,
    mean_metric,
)

__all__ = [
    "make_mesh",
    "shard_sim",
    "shard_batch_pytree",
    "replicate_pytree",
    "mean_metric",
]
