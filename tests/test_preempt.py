"""Graceful preemption (beyond-reference): SIGTERM mid-training must
checkpoint and return cleanly, not die with a stack trace.

The reference has no preemption handling (SURVEY §5 "no elastic training");
on a preemptible TPU pod that means losing everything since the last epoch
save AND a dirty process death. ``AbstractTrainer.train`` installs a
SIGTERM handler for its duration: the flag is checked at batch boundaries
(single-process), ``on_preempt`` persists last.ckpt, and the loop returns
through ``on_train_end``. Multi-host runs fold the flag into the existing
epoch-end ``host_broadcast_max`` stop consensus (wiring covered by the
single-process path here plus the consensus tests in test_multihost.py).
"""

import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_preempt_worker.py"
VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"


@pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixture datasets unavailable")
def test_sigterm_mid_training_checkpoints_and_exits_cleanly(tmp_path):
    proc = subprocess.Popen(
        [sys.executable, str(WORKER), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(REPO), bufsize=1,
    )
    # let it finish two epochs (past compile, mid-run) then preempt it
    lines = []
    deadline = time.time() + 600
    epochs_done = 0
    try:
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("EPOCH_DONE"):
                epochs_done += 1
                if epochs_done == 2:
                    proc.send_signal(signal.SIGTERM)
                    break
            assert time.time() < deadline, "".join(lines)[-3000:]
        out, _ = proc.communicate(timeout=300)
        lines.append(out or "")
    finally:
        if proc.poll() is None:
            proc.kill()
    full = "".join(lines)

    # clean exit through the lifecycle, not a signal death (rc would be -15)
    assert proc.returncode == 0, full[-3000:]
    assert "TRAIN_RETURNED preempted=True" in full, full[-3000:]
    # stopped hundreds of epochs before the configured 500. The signal is
    # sent after EPOCH_DONE 1 (two epochs complete) and can land either in
    # the boundary window of epoch 1 or during epoch 2 — both are clean
    # preemptions, so accept current_epoch of 1 or above.
    epoch = int(full.rsplit("epoch=", 1)[1].split()[0])
    assert 1 <= epoch < 10, full[-1500:]

    # the preempt checkpoint is on disk; the interrupted epoch ran only some
    # of its batches, so the ckpt stamps the PREVIOUS epoch — resume()
    # (start_epoch = epoch+1) then re-runs the interrupted epoch in full
    # instead of silently skipping its remaining batches (ADVICE r4 #2)
    ckpt = tmp_path / "weights" / "last.ckpt"
    assert ckpt.exists()
    from ayolov2_tpu.utils.checkpoint import load_variables

    _, meta = load_variables(ckpt)
    assert int(meta["epoch"]) == epoch - 1


@pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixture datasets unavailable")
def test_cluster_preempt_consensus(tmp_path):
    """SIGTERM to ONE host of a 2-process jax.distributed cluster: the
    preempt flag must propagate through the epoch-end host_broadcast_max
    consensus so BOTH processes leave the collective program together and
    exit cleanly (the failure mode of naive per-host breaking is a
    deadlock in the next all-reduce)."""
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    worker = REPO / "tests" / "_preempt_cluster_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path / f"p{pid}")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO), bufsize=1,
        )
        for pid in range(2)
    ]
    # preempt ONLY process 1 (non-main) after it finishes an epoch
    lines1 = []
    deadline = time.time() + 600
    try:
        for line in procs[1].stdout:
            lines1.append(line)
            if line.startswith("EPOCH_DONE"):
                procs[1].send_signal(signal.SIGTERM)
                break
            assert time.time() < deadline, "".join(lines1)[-3000:]
        out0, _ = procs[0].communicate(timeout=420)
        out1, _ = procs[1].communicate(timeout=420)
        lines1.append(out1 or "")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    full1 = "".join(lines1)

    assert procs[1].returncode == 0, full1[-3000:]
    assert procs[0].returncode == 0, (out0 or "")[-3000:]
    # the signalled host took the preempt path; the other host stopped via
    # the consensus (early_stop=True) without ever seeing the signal
    assert "TRAIN_RETURNED preempted=True early_stop=True" in full1, full1[-2000:]
    assert "TRAIN_RETURNED preempted=False early_stop=True" in out0, out0[-2000:]
    # both stopped long before the configured 100 epochs
    for text in (full1, out0):
        epoch = int(text.rsplit("epoch=", 1)[1].split()[0])
        assert epoch < 10, text[-1500:]
    # host 0 checkpointed at the consensus epoch
    assert (tmp_path / "p0" / "weights" / "last.ckpt").exists()
