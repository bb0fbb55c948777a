"""Worker for the 2-process multi-host training test (run by
tests/test_multihost.py, one subprocess per simulated host).

Each process owns 4 virtual CPU devices of a global (data=2, model=4) mesh —
process p is data-row p. Runs 2 sharded train steps from a process-sharded
ArrayTrainLoader through shard_batch's make_array_from_process_local_data
path and prints per-step global loss + a final weight checksum, which the
test asserts equal across processes AND equal to a single-process
8-device run of the identical program (the reference could only exercise
multi-rank behavior on real GPUs via mp.spawn — SURVEY §4)."""

import os
import sys

N_LOCAL_DEVICES = 4
NUM_PROCESSES = 2

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=NUM_PROCESSES,
                           process_id=pid)

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multihost_common import run_training  # noqa: E402

losses, checksum, val_acc = run_training(
    data=NUM_PROCESSES, model=N_LOCAL_DEVICES,
    process_index=jax.process_index(), process_count=jax.process_count())
print(f"RESULT pid={pid} losses={','.join(f'{l:.10f}' for l in losses)} "
      f"checksum={checksum:.10f} val_acc={val_acc:.6f}", flush=True)
