"""TRUE multi-process distributed runtime test.

`tests/test_parallel.py` exercises the sharded programs on one process with
8 virtual devices; this spawns TWO separate OS processes that rendezvous
through `jax.distributed` (the exact bring-up a 2-host pod-slice job uses,
SURVEY.md section 5.8) and run a cross-process collective over a global
mesh — validating `parallel/multihost.py` beyond the single-process
degenerate path: coordinator handshake, global device enumeration,
host-local -> global array assembly, and cross-process psum agreement.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from rgbd360_tpu.parallel import multihost

pid = int(sys.argv[1])
ok = multihost.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert ok, "distributed bring-up failed"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 procs x 2 devices

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.global_mesh("kf")
# each process contributes its own shard: process p owns values p*2, p*2+1
local = np.arange(2, dtype=np.float32) + 2 * pid
garr = multihost.host_local_to_global(mesh, P("kf"), jnp.asarray(local))

@jax.jit
def total(x):
    return jnp.sum(x)

s = float(total(garr))
assert s == 0 + 1 + 2 + 3, s  # saw every process's shard
assert multihost.all_hosts_agree(s), "agreement check failed"
print(f"proc {pid} OK sum={s}")
"""


def test_two_process_distributed_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_", "PALLAS_", "AXON_", "TPU_"))
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), addr],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker hung:\n{out}")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"proc {i} OK sum=6.0" in out, out
