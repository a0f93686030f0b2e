"""Multi-host bootstrap wiring (SURVEY.md §7.8; VERDICT r1 missing #1).

Real N>=2-host runs need N machines; what IS testable on one host is the
wiring: jax.distributed.initialize with a 1-process topology, the global
mesh over the resulting device list, a distributed SpGEMM on it, and env-var
plumbing. Runs in a SUBPROCESS so the coordinator service and distributed
client never pollute the test process.
"""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_CHILD = r"""
import json
import numpy as np
import jax

from benchmark_spgemm_using_csr_tpu.parallel.bootstrap import (
    global_mesh, init_multihost,
)

topo = init_multihost()  # topology from env vars
assert topo.process_count == 1 and topo.process_id == 0
topo2 = init_multihost()  # idempotent second call
assert topo2.process_count == 1

mesh = global_mesh()
assert mesh.shape["rows"] == topo.global_devices

from benchmark_spgemm_using_csr_tpu.parallel.dist import dist_spgemm
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils.generators import erdos_renyi
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal, spgemm_reference,
)

a = CSR.from_scipy(erdos_renyi(96, 96, 4.0, seed=5))
c = dist_spgemm(a, a, mesh, schedule="replicated")
assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
print(json.dumps({"ok": True, "devices": topo.global_devices}))
"""


@pytest.mark.parametrize("via", ["env", "args"])
def test_bootstrap_one_process(via, tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH="/root/repo",
    )
    child = _CHILD
    if via == "env":
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="1",
            PROCESS_ID="0",
        )
    else:
        child = child.replace(
            "init_multihost()  # topology from env vars",
            f'init_multihost("127.0.0.1:{port}", 1, 0)',
        )
    out = subprocess.run(
        [sys.executable, "-c", child],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["devices"] == 4
