"""Multi-host (multi-process) initialization: the DCN path.

SURVEY.md section 2.6: within a slice the env axis shards over ICI via
the ('dp', 'tp') mesh; across hosts the same mesh simply spans all
processes' devices, with `jax.distributed.initialize` wiring the
coordination service (the jax-native replacement for the reference-free
NCCL/MPI layer -- the reference is single-process, src/main.rs).

Usage (one call per process, before any jax computation):

    from tpu_doom.parallel.distributed import initialize
    initialize(coordinator="host0:1234", num_processes=8, process_id=i)
    mesh = global_mesh(tp=1)   # spans ALL processes' devices

or via environment (each process):

    TPUDOOM_COORDINATOR=host0:1234 TPUDOOM_NUM_PROCS=8 TPUDOOM_PROC_ID=i
    ... initialize_from_env() ...

On TPU pods, `initialize()` with no arguments lets jax autodetect the
slice topology. Tested with 2 CPU processes in
tests/test_distributed.py (the driver-runnable DCN dry run).
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None, local_device_ids=None):
    """jax.distributed.initialize wrapper; no-op when already initialized
    or when running single-process with no coordinator configured."""
    if num_processes is not None and num_processes <= 1 and coordinator is None:
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def initialize_from_env() -> bool:
    """Initialize from TPUDOOM_COORDINATOR / TPUDOOM_NUM_PROCS /
    TPUDOOM_PROC_ID (returns False if unset: single-process mode)."""
    coord = os.environ.get("TPUDOOM_COORDINATOR")
    if not coord:
        return False
    return initialize(
        coordinator=coord,
        num_processes=int(os.environ["TPUDOOM_NUM_PROCS"]),
        process_id=int(os.environ["TPUDOOM_PROC_ID"]),
    )


def global_mesh(dp: int | None = None, tp: int = 1):
    """('dp', 'tp') mesh over ALL processes' devices (jax.devices() is
    global after initialize): dp shards ride ICI within a host/slice and
    DCN across hosts, chosen by XLA's partitioner automatically."""
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())
