"""Multi-process JAX multi-controller: 2 host processes, one global mesh,
cross-process psum (the comms path the SLURM launcher sets up — ref Ray
cluster bootstrap ``slurm-template.sh:52-66`` replaced by
``jax.distributed.initialize`` + XLA collectives, SURVEY §2.8)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
from nuzero_tpu.parallel.distributed import (
    initialize_distributed, is_multi_host, local_shard,
)
initialize_distributed(%(coord)r, 2, int(sys.argv[1]))
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from nuzero_tpu.parallel import make_mesh

assert jax.process_count() == 2, jax.process_count()
assert is_multi_host()
assert len(jax.devices()) == 4  # 2 virtual CPU devices x 2 processes
assert local_shard(8) == 4

mesh = make_mesh(jax.devices())
# Each process contributes its local shard; the psum must see all 8 rows.
shard = NamedSharding(mesh, P("dp"))
local = jnp.arange(4, dtype=jnp.float32) + 4 * jax.process_index()
global_x = jax.make_array_from_process_local_data(shard, local, (8,))
# Global reduction over the cross-process sharded axis: XLA inserts the
# all-reduce between the two host processes.
s = float(jax.jit(jnp.sum)(global_x))
assert s == sum(range(8)), s
print("WORKER_OK", jax.process_index(), s, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO, "coord": coord})
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # Run the workers on pure multi-process CPU: drop the TPU-tunnel
    # plugin (registered via PYTHONPATH sitecustomize) and its platform
    # pin so the coordinator wires two CPU hosts.
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
        assert "WORKER_OK" in out
