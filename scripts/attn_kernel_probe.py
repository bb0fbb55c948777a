"""Probe: fused window-attention kernel efficiency (round-4 VERDICT #1).

Times the Pallas kernel fwd and fwd+bwd on the AlterNet50 b=128 stage
shapes against their pure-HBM floors, then A/Bs redesigns. The round-3
decomposition put the recompute-backward at ~9x over its HBM floor; the
hypothesis is MXU row-streaming on tiny per-(window, head) matmuls
(M=36, K=32, N=36 — the MXU streams M rows per op regardless of K, so
W*heads*N row-cycles per dot site) plus 36->128 lane padding on all the
f32 score-tensor VPU work.

Stage shapes (AlterNet50, b=128, windows 6/6/3):
  s2: W=2048, N=36, C=128, heads=4,  nW=16 (SW-MSA mask)
  s3: W= 512, N=36, C=256, heads=8,  nW=4
  s4: W= 512, N= 9, C=512, heads=16, nW=4

python scripts/attn_kernel_probe.py [s2 s3 s4] [--masked]
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
from fr_tpu.models.swin_common import shifted_window_mask  # noqa: E402
from fr_tpu.ops import fused_window_attn as fwa  # noqa: E402

HBM_GBPS = 800.0  # v5e ~819 GB/s


def bench(fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def floors(W, N, C, g_bytes=4, out_bytes=4):
    """(fwd_ms, bwd_ms) pure HBM floors: fwd reads qkv bf16 + writes out;
    bwd reads qkv + g, writes dqkv bf16."""
    qkv = W * N * 3 * C * 2
    out = W * N * C * out_bytes
    g = W * N * C * g_bytes
    fwd = (qkv + out) / HBM_GBPS / 1e6
    bwd = (qkv + g + W * N * 3 * C * 2) / HBM_GBPS / 1e6
    return fwd, bwd


SHAPES = {
    "s2": dict(W=2048, N=36, C=128, heads=4, nW=16, HW=24),
    "s3": dict(W=512, N=36, C=256, heads=8, nW=4, HW=12),
    "s4": dict(W=512, N=9, C=512, heads=16, nW=4, HW=6),
}


def run_shape(name, masked):
    s = SHAPES[name]
    W, N, C, heads, nW = s["W"], s["N"], s["C"], s["heads"], s["nW"]
    ws = int(np.sqrt(N))
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((W, N, 3 * C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    scale = jnp.asarray(np.full((heads,), 3.7, np.float32))
    bias16 = jnp.asarray(rng.standard_normal((heads, N, N)).astype(np.float32))
    mask = (jnp.asarray(shifted_window_mask(s["HW"], s["HW"], ws, ws // 2))
            if masked else None)
    g = jnp.asarray(rng.standard_normal((W, N, C)).astype(np.float32))

    ffwd, fbwd = floors(W, N, C)
    tag = f"{name}{'+mask' if masked else ''}"

    variants = {
        "v1 (current)": lambda q, sc, b, m: fwa.fused_window_attention(
            q, sc, b, heads, nW, m, 1024),
    }
    if hasattr(fwa, "fused_window_attention_packed"):
        variants["v2 (packed)"] = lambda q, sc, b, m: \
            fwa.fused_window_attention_packed(q, sc, b, heads, nW, m, 1024)

    for vname, f in variants.items():
        fwd = jax.jit(lambda q, sc, b: f(q, sc, b, mask))
        t_f = bench(fwd, (qkv, scale, bias16))

        def loss(q, sc, b):
            return jnp.sum(f(q, sc, b, mask) * g)
        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_b = bench(gr, (qkv, scale, bias16))
        print(f"{tag:8s} {vname:14s} fwd {t_f:7.3f} ms ({t_f/ffwd:5.1f}x floor)"
              f"   fwd+bwd {t_b:7.3f} ms ({t_b/(ffwd+fbwd):5.1f}x floor)",
              flush=True)


def main():
    names = [a for a in sys.argv[1:] if a in SHAPES] or list(SHAPES)
    masked = "--masked" in sys.argv
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for n in names:
        run_shape(n, False)
        if masked:
            run_shape(n, True)


if __name__ == "__main__":
    main()
