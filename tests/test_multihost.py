"""Two-process ``jax.distributed`` data parallelism (the multi-host DCN
path, on CPU): per-host loader sharding + global-batch SPMD train step.

Spawns scripts/train_multihost_demo.py twice and checks both processes
execute the SAME global computation (identical per-step losses).
"""

import os
import re
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_training():
    port = _free_port()
    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "train_multihost_demo.py"
    )
    env = dict(os.environ)
    # the demo provisions its own per-process virtual device count
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, script,
                "--process_id", str(pid),
                "--coordinator", f"localhost:{port}",
                "--steps", "2",
                "--devices_per_process", "4",
                "--local_batch", "4",
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "multihost demo OK" in out, out
        assert "8 global devices" in out, out
        # global batch = 2 processes x 4 local
        assert "global_batch=8" in out, out
    # Both processes must report the SAME global loss each step.
    losses = [re.findall(r"loss=([0-9.]+)", o) for o in outs]
    assert len(losses[0]) == 2, outs[0]
    assert losses[0] == losses[1], (losses, outs)
