"""Multi-process integration test for parallel/distributed.py.

SURVEY §2.3 #30 (multi-host init) was only exercised as a single-process
no-op in round 1.  Here we launch TWO real OS processes, initialize the
jax distributed runtime between them (coordinator on localhost), build
the global data mesh over both processes' virtual CPU devices, and run a
psum across the process boundary — the same code path a multi-host TPU
pod takes, minus the ICI.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
from rgba_tpu.parallel.distributed import initialize, global_mesh, \
    local_batch_slice
initialize(coordinator_address="localhost:%(port)d", num_processes=2,
           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_mesh()
ndev = len(jax.devices())
assert ndev == 8, ndev        # 4 local x 2 processes
assert mesh.devices.size == 8

# one global array sharded over the data axis, reduced across processes
sharding = NamedSharding(mesh, P("data"))
local = jnp.full((4, 2), float(pid + 1))   # host shard: 4 rows of pid+1
garr = jax.make_array_from_process_local_data(sharding, local, (8, 2))

@jax.jit
def total(a):
    return jnp.sum(a)

t = float(total(garr))        # psum across hosts under the hood
assert t == (4*2*1 + 4*2*2), t

sl = local_batch_slice(8)
assert sl == slice(4 * pid, 4 * pid + 4), sl
print("WORKER_OK", pid, t, flush=True)
"""


_TRAIN_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
from rgba_tpu.parallel.distributed import initialize, global_mesh
initialize(coordinator_address="localhost:%(port)d", num_processes=2,
           process_id=pid)

from rgba_tpu.core.config import TrainConfig
from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.parallel.mesh import shard_batch
from rgba_tpu.train.loops import RGBTrainer

mesh = global_mesh()                       # 8 devices over 2 processes
cfg = TrainConfig(train_lambda=1024, batch_size=8, aux_lr=1e-3, tot_step=1)
trainer = RGBTrainer(cfg, "/tmp/rgba_tpu_dist_" + str(pid), mesh=mesh)
data = synthetic_rgba_batch(8, 64, 64, seed=0)   # same batch on both hosts
batch = {"masked_image": data["masked_image"], "alpha": data["alpha"],
         "image": data["image"]}
state = trainer.init_state(batch)
step_fn = trainer.compiled_step()
db = shard_batch(mesh, batch)              # global array, 4 imgs per host
state, metrics = step_fn(state, db, jax.random.PRNGKey(0))
rd = float(jax.device_get(metrics["rd_loss"]))
assert rd == rd and abs(rd) < 1e9, rd
print("TRAIN_OK", pid, f"{rd:.6f}", flush=True)
"""


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two(script_text, tmp_path, timeout=600):
    script = tmp_path / "worker.py"
    script.write_text(script_text % {"port": _free_port()})
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo"
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        # a worker that hung (e.g. its peer died during init) must not
        # outlive the test and poison later runs
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


@pytest.mark.slow
def test_two_process_mesh_psum(tmp_path):
    outs = _run_two(_WORKER, tmp_path, timeout=300)
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out, out


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    """One REAL RGBTrainer step on a global mesh spanning two processes:
    batch sharded 4+4, params replicated, XLA inserts the cross-process
    gradient all-reduce. Both hosts must compute the identical rd_loss."""
    outs = _run_two(_TRAIN_WORKER, tmp_path)
    rds = []
    for i, out in enumerate(outs):
        lines = [ln for ln in out.splitlines() if ln.startswith("TRAIN_OK")]
        assert lines, f"worker {i} produced no TRAIN_OK:\n{out}"
        rds.append(lines[0].split()[2])
    assert rds[0] == rds[1], f"hosts disagree on rd_loss: {rds}"
