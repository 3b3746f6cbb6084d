"""Mesh construction + shardings for the batched simulator.

Design (SURVEY.md section 2.6): the env axis is embarrassingly parallel ->
pure data parallelism over a ('dp',) mesh axis via NamedSharding; scene
arrays are replicated (they are read-only level data, a few MB); an
optional 'tp' axis shards the framebuffer's row dimension for very large
resolutions. Collectives (psum/pmean for metrics) ride ICI automatically
through jit's partitioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """('dp', 'tp') mesh over the available devices (dp majors)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp ({dp}*{tp}) != device count {n}"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_batch_pytree(tree, mesh: Mesh):
    """Shard every leaf's leading (env) axis over 'dp'."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate_pytree(tree, mesh: Mesh):
    """Fully replicate (scene/level data)."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def shard_sim(scene, state, actions, mesh: Mesh):
    """Standard placement: scene replicated, state/actions env-sharded."""
    return (
        replicate_pytree(scene, mesh),
        shard_batch_pytree(state, mesh),
        shard_batch_pytree(actions, mesh),
    )


def frame_sharding(mesh: Mesh):
    """(B, H, W) framebuffer: envs over dp, rows over tp."""
    return NamedSharding(mesh, P("dp", "tp", None))


def mean_metric(x, mesh: Mesh):
    """Global mean of a per-env metric array whose leading axis is sharded
    over 'dp': per-shard partial means + an explicit ICI pmean collective
    (shard_map; SURVEY.md section 2.6 "the only real collectives are
    metric reductions")."""
    spec = P("dp", *([None] * (x.ndim - 1)))

    def _local(v):
        # Input is sharded over 'dp' only (replicated over 'tp'), so the
        # mean of equal-size per-shard means over 'dp' is the global mean.
        return jax.lax.pmean(jnp.mean(v), axis_name="dp")

    f = jax.jit(
        jax.shard_map(_local, mesh=mesh, in_specs=spec, out_specs=P())
    )
    return f(x)
