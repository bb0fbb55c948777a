"""Test harness: 8 virtual CPU devices so multi-chip sharding is exercised
without TPU hardware (the torch reference had no equivalent of this —
SURVEY §4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly
# so the 8-virtual-device mesh is used.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def add_reference_to_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def init_torch_dist():
    """World-size-1 gloo group for reference-parity tests. file:// store with
    a per-process unique path — TCP rendezvous collides when several test
    processes run concurrently."""
    import tempfile
    import torch.distributed as dist
    if not dist.is_initialized():
        f = tempfile.NamedTemporaryFile(prefix="fr_tpu_gloo_", delete=False)
        dist.init_process_group(backend="gloo",
                                init_method=f"file://{f.name}",
                                rank=0, world_size=1)
