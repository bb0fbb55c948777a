"""Stage-1 conv experiment: XLA's conv at 56²×64 runs at ~50-55% of MXU peak
(ROUND2_NOTES roofline table) because C=64 fills half the 128-deep
contraction. Candidates to beat it:

  A. lax.conv_general_dilated (the baseline the model uses today)
  B. explicit im2col → GEMM [M, 576] @ [576, 64] (contraction 576 = 4.5
     full MXU passes; tests whether the GEMM alone reaches peak)
  C. tap-sum formulation: Σ_{dh,dw} shift(x) @ W[dh,dw] as 9 GEMMs of
     [M, 64] @ [64, 64]
  D. dual-pixel packing: reshape x to pair adjacent rows into channels
     [N, H/2, W, 128] and run an equivalent conv with rearranged weights
     (only measures the GEMM shape effect, NOT numerically the same conv)
  E. Pallas fused im2col+GEMM kernel (ops/conv_s1.py) if present

    python scripts/stage1_probe.py [batch]
"""

import os
import sys
import time
from functools import partial

import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def fetch(x):
    """Sync via a 1-element value fetch (block_until_ready returns early on
    the axon remote runtime, and D2H of the full array is seconds-slow over
    the tunnel — fetch exactly one element)."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def timeit(fn, *args, n=30):
    fetch(fn(*args))
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn(*args)
    fetch(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    H = W = 56
    C = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    flops = 2 * b * H * W * 9 * C * C
    peak = 197e12

    def report(name, t):
        print(f"{name:28s} {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s "
              f"({100*flops/t/peak:5.1f}% peak)", flush=True)

    # A: plain conv
    @jax.jit
    def conv_a(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    report("A lax.conv", timeit(conv_a, x, w))

    # B: explicit im2col + one GEMM
    @jax.jit
    def conv_b(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pat = jnp.stack([xp[:, dh:dh + H, dw:dw + W, :]
                         for dh in range(3) for dw in range(3)], axis=3)
        m = pat.reshape(b * H * W, 9 * C)
        return (m @ w.reshape(9 * C, C)).reshape(b, H, W, C)
    report("B im2col+GEMM", timeit(conv_b, x, w))

    # B2: the GEMM alone on pre-formed patches (upper bound for B/E)
    pat = jax.jit(lambda x: jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0))))(x)
    patches = jax.jit(lambda xp: jnp.stack(
        [xp[:, dh:dh + H, dw:dw + W, :] for dh in range(3)
         for dw in range(3)], axis=3).reshape(b * H * W, 9 * C))(pat)
    wf = w.reshape(9 * C, C)
    gemm = jax.jit(lambda m, wf: m @ wf)
    report("B2 GEMM only [M,576]@[576,64]", timeit(gemm, patches, wf))

    # B3: GEMM with doubled output width [M,576]@[576,128]
    wf2 = jnp.concatenate([wf, wf], axis=1)
    report("B3 GEMM [M,576]@[576,128]", timeit(gemm, patches, wf2))

    # C: 9 shifted GEMMs
    @jax.jit
    def conv_c(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((b, H, W, C), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                acc += jnp.einsum(
                    "bhwc,cd->bhwd",
                    xp[:, dh:dh + H, dw:dw + W, :], w[dh, dw],
                    preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)
    report("C 9 tap GEMMs", timeit(conv_c, x, w))

    # D: shape-effect only — conv at [b, 28, 56, 128] (same FLOPs/2... no:
    # same total elements, C=128 → full lanes; weights [3,3,128,128] is 4x
    # the FLOPs, so use [3,3,128,64->...]. Instead: conv 28²×128 with
    # identical total FLOPs as A for an apples-to-apples tiling comparison.
    x2 = jnp.asarray(rng.standard_normal((b, 28, 28, 128)), jnp.bfloat16)
    w2 = jnp.asarray(0.05 * rng.standard_normal((3, 3, 128, 128)),
                     jnp.bfloat16)

    @jax.jit
    def conv_d(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t = timeit(conv_d, x2, w2)
    f2 = 2 * b * 28 * 28 * 9 * 128 * 128
    print(f"{'D conv 28²×128 (control)':28s} {t*1e3:7.3f} ms  "
          f"{f2/t/1e12:6.1f} TF/s ({100*f2/t/peak:5.1f}% peak)", flush=True)

    # E: Pallas kernel if available
    try:
        from fr_tpu.ops.conv_s1 import conv3x3_s1
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        je = jax.jit(conv3x3_s1)
        out_a = conv_a(x, w)
        out_e = je(x, w)
        err = float(jnp.max(jnp.abs(out_a.astype(jnp.float32)
                                    - out_e.astype(jnp.float32))))
        report("E pallas conv3x3_s1", timeit(je, x, w))
        print(f"  max|A-E| = {err:.4f}")
    except ImportError:
        print("E pallas kernel not present")


if __name__ == "__main__":
    main()
