"""Multi-host (2-process) distributed dry run over the DCN path
(SURVEY.md section 2.6; VERDICT r1 item 4/7): two CPU processes join a
jax.distributed cluster, build one global ('dp', 'tp') mesh spanning both,
shard the env axis across processes, run a sim step + a global pmean --
the cross-host collective."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]

from tpu_doom.parallel.distributed import initialize, global_mesh
initialize(coordinator=f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2  # global devices across both processes

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tpu_doom.models import DoomSim
from tpu_doom.utils.config import GameConfig, PlayerConfig
from tpu_doom.sim.step import step as sim_step

sim = DoomSim(GameConfig(
    wad_file=":test:", width=32, height=16, batch_size=4,
    player=PlayerConfig(clip_substeps=1, enable_noclip=False),
))
mesh = global_mesh(tp=1)
scene, cfg = sim.scene, sim.config
sharding = NamedSharding(mesh, P("dp"))

def shard(x):
    spec = P("dp", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
    return jax.device_put(x, NamedSharding(mesh, spec))

state = jax.tree_util.tree_map(shard, sim.reset(4))
acts = jax.tree_util.tree_map(shard, sim.null_actions(4))

@jax.jit
def step_and_reduce(state, acts):
    state = sim_step(scene, cfg, state, acts)
    # The DCN collective: global mean over the sharded env axis.
    return state, jnp.mean(state.pos[:, 1])

state, mean_y = jax.block_until_ready(step_and_reduce(state, acts))
print(f"RESULT pid={pid} procs={jax.process_count()} mean_y={float(mean_y):.6f}")
"""


@pytest.mark.filterwarnings("ignore")
def test_two_process_dcn_dry_run(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out[-500:], err[-1500:])
    results = [
        line for rc, out, err in outs for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(results) == 2, outs
    # Both processes computed the SAME global mean (the pmean crossed
    # the process boundary).
    vals = {line.split("mean_y=")[1] for line in results}
    assert len(vals) == 1, results
