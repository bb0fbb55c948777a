"""Probe: can the SW-MSA roll be folded into window partition (VERDICT #8's
XLA-side alternative)?

Candidates on AlterNet50 stage shapes (b=128 @192px — stage2 24²×128,
stage3 12²×256), fwd+bwd through partition∘roll:
  A) as-built: jnp.roll (slice+concat) → reshape/transpose partition
  B) one gather: rolled partition via jnp.take with precomputed static
     row/col index vectors (composes roll into the indexing)
  C) partition only (no roll) — the floor the roll adds to

python scripts/roll_partition_probe.py
"""

import os
import sys
import time

import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fr_tpu.models.swin_common import window_partition, window_reverse  # noqa: E402


def bench(name, fn, x, iters=30):
    g = jax.jit(jax.grad(lambda v: jnp.sum(jnp.square(fn(v)))))
    y = g(x)
    float(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = g(x)
    float(jnp.sum(y[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:48s} {dt:7.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    ws, shift = 6, 3
    for (H, C) in ((24, 128), (12, 256)):
        x = jnp.asarray(rng.standard_normal((128, H, H, C))
                        .astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray((np.arange(H) + shift) % H)

        def roll_then_partition(v):
            r = jnp.roll(v, (-shift, -shift), axis=(1, 2))
            w = window_partition(r, ws)
            return window_reverse(w, ws, H, H)

        def gather_partition(v):
            r = jnp.take(jnp.take(v, idx, axis=1), idx, axis=2)
            w = window_partition(r, ws)
            return window_reverse(w, ws, H, H)

        def partition_only(v):
            w = window_partition(v, ws)
            return window_reverse(w, ws, H, H)

        print(f"-- ({H}x{H}x{C})")
        a = bench("A roll -> partition -> reverse", roll_then_partition, x)
        b = bench("B gather-fused partition -> reverse", gather_partition, x)
        c = bench("C partition -> reverse (no roll)", partition_only, x)
        print(f"   roll overhead as-built: {a - c:.3f} ms; "
              f"gather vs as-built: {b - a:+.3f} ms")


if __name__ == "__main__":
    main()
