"""Multi-host training: 2 jax.distributed CPU processes (4 virtual devices
each) vs the identical single-process 8-device program.

Validates the multi-process global-batch assembly
(`jax.make_array_from_process_local_data` in train/step.py shard_batch) and
the process-sharded loader contract (local images + global labels) — the
TPU-native equivalent of the reference's DistributedSampler + NCCL multi-rank
path (reference utils/data_partial.py:273, main/main.py:251-262), which the
reference itself could never test off-hardware (SURVEY §4)."""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse(line: str):
    m = re.search(
        r"RESULT pid=(\d+) losses=(\S+) checksum=(\S+) val_acc=(\S+)", line)
    assert m, f"no RESULT line in: {line!r}"
    losses = [float(x) for x in m.group(2).split(",")]
    return int(m.group(1)), losses, float(m.group(3)), float(m.group(4))


def test_two_process_training_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "multihost_worker.py"), str(pid),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(HERE.parent))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        pid, losses, checksum, val_acc = _parse(line)
        results[pid] = (losses, checksum, val_acc)
    assert set(results) == {0, 1}

    # both processes observe the same global losses / final weights, and the
    # validation epoch (embed_global_batch eval path) reports the identical
    # accuracy on every rank
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=0)
    assert results[0][1] == results[1][1]
    assert results[0][2] == results[1][2]

    # and they match the single-process 8-device run of the same program.
    # Tolerance: cross-process collectives run through Gloo with a different
    # f32 reduction order than XLA's intra-process psum — measured ~1.5e-5
    # relative after 2 steps; anything beyond 1e-4 would flag a real
    # semantic divergence (wrong batch slice, wrong labels, missed grad).
    from multihost_common import run_training
    ref_losses, ref_checksum, ref_acc = run_training(
        data=2, model=4, process_index=0, process_count=1)
    np.testing.assert_allclose(results[0][0], ref_losses, rtol=1e-4)
    np.testing.assert_allclose(results[0][1], ref_checksum, rtol=1e-4)
    # accuracy is a thresholded count over 24 pairs — must agree exactly
    assert results[0][2] == ref_acc
