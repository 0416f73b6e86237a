"""Multi-process ``jax.distributed`` data parallelism (the multi-host DCN
path, on CPU): per-host loader sharding + global-batch SPMD train step.

Spawns scripts/train_multihost_demo.py N times and checks all processes
execute the SAME global computation (identical per-step losses).  The
4-process case runs over a 22-window dataset (22 % 4 != 0), exercising the
uneven-host-shard truncation in data/loader.py: strided shards of 6/6/5/5
are cut to 5 apiece so the epoch tail (and the epoch rollover at step 2)
stays lockstep instead of deadlocking.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_demo(num_processes, steps, local_batch, devices_per_process):
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
                "--num_processes", str(num_processes),
                "--coordinator", f"localhost:{port}",
                "--steps", str(steps),
                "--devices_per_process", str(devices_per_process),
                "--local_batch", str(local_batch),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(num_processes)
    ]
    return procs, [p.communicate(timeout=900)[0] for p in procs]


def test_two_process_data_parallel_training():
    procs, outs = _run_demo(
        num_processes=2, steps=2, local_batch=4, devices_per_process=4
    )
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


def test_four_process_uneven_shards():
    """4 processes over 22 windows: shards are uneven (6/6/5/5) and, at
    local_batch=2, step 3 crosses an epoch boundary — both only survive
    with the common-minimum shard truncation."""
    procs, outs = _run_demo(
        num_processes=4, steps=3, local_batch=2, devices_per_process=2
    )
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "multihost demo OK" in out, out
        assert "8 global devices" in out, out
        # global batch = 4 processes x 2 local
        assert "global_batch=8" in out, out
        # the fixture is genuinely uneven and genuinely truncated
        assert "uneven=True" in out, out
        assert "truncated to 5" in out, out
    losses = [re.findall(r"loss=([0-9.]+)", o) for o in outs]
    assert len(losses[0]) == 3, outs[0]
    for other in losses[1:]:
        assert other == losses[0], (losses, outs)


@pytest.mark.parametrize("num_hosts,n", [(4, 22), (3, 10), (2, 7)])
def test_loader_host_shards_lockstep(num_hosts, n, tmp_path):
    """Unit view of the truncation: every host yields the SAME batch count
    and the union of shards covers exactly n - n % num_hosts indices."""
    from livelyspeaker_tpu.data.loader import DataLoader

    class _IdxDataset:
        def __len__(self):
            return n

        def batch(self, idx, fields=None):
            return {"i": idx}

    counts, seen = [], []
    for h in range(num_hosts):
        dl = DataLoader(
            _IdxDataset(), batch_size=2, shuffle=True, seed=7,
            host_id=h, num_hosts=num_hosts,
        )
        dl.collate = lambda b: b
        dl.epoch = 0  # same epoch on every host
        idx = dl._epoch_indices()
        assert len(idx) == n // num_hosts, (h, idx)
        counts.append(len(idx))
        seen.extend(idx.tolist())
    assert len(set(counts)) == 1
    assert len(seen) == len(set(seen)) == (n // num_hosts) * num_hosts
