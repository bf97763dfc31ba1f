"""2-process jax.distributed smoke: validates the --multihost code path
(cli.py train --multihost -> jax.distributed.initialize) actually brings up
a multi-process JAX runtime and that cross-process collectives work, without
multi-host hardware."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns real multi-process jax.distributed

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%(port)d",
                           num_processes=2, process_id=%(pid)d)
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
from jax.experimental import multihost_utils

x = jnp.ones(()) * (jax.process_index() + 1.0)
s = multihost_utils.process_allgather(x)
print("ALLGATHER_SUM", float(s.sum()), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(240)
def test_two_process_distributed_allgather(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    procs = []
    for pid in range(2):
        script = _WORKER % {"port": port, "pid": pid}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker hung")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "ALLGATHER_SUM 3.0" in out, out
