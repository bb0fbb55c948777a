"""TPU-gated acceptance test (VERDICT round-1 next #5): the fused Pallas
kernels' REAL (Mosaic-compiled) lowering + on-chip train smoke + throughput
sanity, via scripts/tpu_smoke.py.

The CPU suite only exercises the kernels' interpret/jnp fallbacks
(fr_tpu/ops/fused_pfc.py); this test gives the real lowering recurring
coverage whenever a chip is attached. Runs in a subprocess because
tests/conftest.py pins this process to the CPU platform.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_tpu_acceptance_smoke():
    env = dict(os.environ)
    # undo the CPU-platform pins the test harness sets
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)

    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "tpu_smoke.py")],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1800)
    out = proc.stdout + proc.stderr
    if "SKIP: backend" in out:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, out
    assert "fused kernel parity ok" in out, out
    assert "train smoke ok" in out, out
