"""jax.distributed multi-process CPU test: the distributed comm backend.

Spawns 2 OS processes x 4 virtual CPU devices with gloo collectives — the
closest available stand-in for a multi-host TPU slice (SURVEY.md §4). Each
worker (tests/mp_worker.py) drives the slab-sharded map (cross-process
insert / k-NN merge / ppermute roll migration) and the keypoint-sharded
ICP, asserting equivalence against single-device references."""

import os
import socket
import subprocess
import sys


def test_two_process_sharded_ops(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs, logs = [], []
    for pid in range(2):
        log = open(tmp_path / f"mp_{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=log, stderr=subprocess.STDOUT, env=env))
    rcs = [p.wait(timeout=400) for p in procs]
    for log in logs:
        log.close()
    outs = [(tmp_path / f"mp_{pid}.log").read_text() for pid in range(2)]
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MP_OK" in out, f"worker {pid} incomplete:\n{out[-3000:]}"
