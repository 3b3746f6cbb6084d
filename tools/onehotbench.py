#!/usr/bin/env python3
"""Micro-benchmark: cost of the one-hot SEGMENT compare inside
`_mxu_lookup_i8` at the driver lookup shape, per dtype strategy.

The lookup is dominated by two passes over a (S, n) intermediate:
building the one-hot (VPU compares on an int32 iota today) and the
(128, S) @ (S, n) int8 MXU contraction. This times kernel variants:

  i32      -- production: int32 iota compare -> int8 cast
  i16      -- int16 iota compare (2x elements per vreg op)
  i8x2     -- int8 wrapped iota for seg&255 + banded int8 constant
              concat for seg>>8: three int8 passes, 4x elements/op
  matonly  -- one-hot hoisted to a constant (measures the matmul floor)

Usage: python tools/onehotbench.py [S n reps]   (defaults 534 3072 50)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    return np.asarray(x.ravel()[0:1])


def _kernel(idx_ref, tab_ref, out_ref, *, S, n, variant, iters):
    idx = idx_ref[0]
    hi = (idx >> 7)[None, :]
    lo = (idx & 127)[None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    ohl = (lane == lo).astype(jnp.int32)
    acc = jnp.zeros((n,), jnp.int32)
    for it in range(iters):
        hi_t = hi + it  # defeat CSE across iterations
        if variant == "i32":
            seg = jax.lax.broadcasted_iota(jnp.int32, (S, n), 0)
            oh = (seg == hi_t).astype(jnp.int8)
        elif variant == "i16":
            seg = jax.lax.broadcasted_iota(jnp.int16, (S, n), 0)
            oh = (seg == hi_t.astype(jnp.int16)).astype(jnp.int8)
        elif variant == "i8x2":
            lo8 = jax.lax.broadcasted_iota(jnp.int8, (S, n), 0)  # seg mod 256
            bands = [
                jnp.full((min(256, S - s0), n), s0 >> 8, jnp.int8)
                for s0 in range(0, S, 256)
            ]
            hi8 = jnp.concatenate(bands, axis=0)
            m = (lo8 == hi_t.astype(jnp.int8)) & (
                hi8 == (hi_t >> 8).astype(jnp.int8))
            oh = m.astype(jnp.int8)
        elif variant == "matonly":
            oh = jnp.full((S, n), it & 1, jnp.int8)
        else:
            raise ValueError(variant)
        cols = jax.lax.dot_general(
            tab_ref[...], oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc += jnp.sum(cols * ohl, axis=0)
    out_ref[0, 0] = acc


def run(variant, S, n, reps, iters=16, grid=64):
    """grid x iters lookups per dispatch: the ~19 ms tunnel dispatch
    overhead amortizes to ~0.02 us per lookup at the defaults."""
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, S * 128, (1, n)), jnp.int32)
    tab = jnp.asarray(
        np.random.default_rng(1).integers(-128, 128, (S, 128)), jnp.int8)
    f = pl.pallas_call(
        functools.partial(_kernel, S=S, n=n, variant=variant, iters=iters),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, n), jnp.int32),
    )
    g = jax.jit(f)
    _sync(g(idx, tab))
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(g(idx, tab))
    dt = (time.perf_counter() - t0) / reps / iters / grid * 1e6
    print(f"{variant:8s} S={S} n={n}: {dt:8.3f} us/lookup")
    return dt


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 534
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    for v in ("matonly", "i32", "i16", "i8x2"):
        try:
            run(v, S, n, reps)
        except Exception as e:  # noqa: BLE001 -- report unsupported variants
            print(f"{v:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")
