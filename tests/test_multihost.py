"""Multi-host (2-process jax.distributed CPU cluster) train-step parity.

VERDICT r1 item 6: `initialize_distributed()` + per-host loader shards must
train a step with the SAME loss as single-process. Each subprocess owns 4
virtual CPU devices; together they form one 8-device mesh. Reference
contract certified: train.py:22-26 (env bootstrap), data_loader_utils.py:67,
101-103 (per-rank split), DDP gradient all-reduce (train_model_builder.py:75-78).
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(n_procs: int, timeout: int = 300, n_items: int = 8, global_bs: int = 8,
                 env: dict | None = None):
    import os

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(n_procs), str(port),
             str(n_items), str(global_bs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=str(REPO),
            env={**os.environ, **(env or {})},
        )
        for pid in range(n_procs)
    ]
    items, counts = [], []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        per_batch = re.findall(r"ITEMS \[([^\]]+)\]", out)
        assert per_batch, f"no ITEMS line in:\n{out[-3000:]}"
        items.append([np.array([float(v) for v in b.split(",")]) for b in per_batch])
        m = re.search(r"N_BATCHES (\d+)", out)
        assert m, f"no N_BATCHES line in:\n{out[-3000:]}"
        counts.append(int(m.group(1)))
    return items, counts


def test_two_process_cluster_matches_single_process():
    single = _run_cluster(1)[0][0][0]
    two, _ = _run_cluster(2)
    # both processes observe the identical replicated loss
    np.testing.assert_allclose(two[0][0], two[1][0], rtol=0, atol=0)
    # and it matches the single-process run on the same global batch
    # (fp tolerance: the global batch is host-interleaved, so reduction
    # order differs)
    np.testing.assert_allclose(two[0][0], single, rtol=1e-4, atol=1e-6)
    assert np.isfinite(single).all()


def test_four_process_cluster_uneven_dataset():
    """VERDICT r3 task 7: 4 hosts over an 18-item dataset (not divisible by
    4) — the equal-length shard padding must give every host the SAME batch
    count (a lone host in the collective step deadlocks the job), every
    epoch batch must execute through the sharded step, and the first global
    batch (host-interleaved indices 0..15) must reproduce the single-process
    loss. Reference: DDP launch contract README.md:160-166 +
    DistributedSampler equal-shards (data_loader_utils.py:101-103)."""
    single = _run_cluster(1, n_items=18, global_bs=16)[0][0]
    four, counts = _run_cluster(4, timeout=420, n_items=18, global_bs=16)
    # every host ran the same number of batches: ceil(ceil(18/4)/4) = 2
    assert counts == [2, 2, 2, 2], counts
    # replicated loss identical across all 4 processes, for every batch
    for batch_i in range(2):
        for p in range(1, 4):
            np.testing.assert_allclose(
                four[p][batch_i], four[0][batch_i], rtol=0, atol=0
            )
    # first global batch covers exactly items 0..15 (host-interleaved) —
    # same set as the single-process first batch, so the loss must match
    np.testing.assert_allclose(four[0][0], single[0], rtol=1e-4, atol=1e-6)
    assert all(np.isfinite(b).all() for b in four[0])
