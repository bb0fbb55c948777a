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

python scripts/attn_kernel_probe.py [s2 s3 s4] [--masked] [--parity] [--no-timing]
"""

import functools
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


def bench(fn, args, iters=None):
    if iters is None:
        # host-side wall clock over the tunnel jitters by ~10 ms per fetch;
        # per-iteration noise = jitter/iters, so 96+ iterations are needed
        # to resolve 0.1 ms differences between kernel variants
        iters = int(os.environ.get("ATTN_PROBE_ITERS", "96"))
    """Per-call ms via an in-jit lax.scan, differenced between 2N and N
    iterations so compile/dispatch cost cancels, with a VALUE FETCH to
    synchronise (axon's block_until_ready returns early — verify skill
    gotcha; the round-3 run of this probe produced physically impossible
    numbers like fwd at 0.2x the HBM floor because of it).

    The scan body threads a data dependency through bias16 (adding a
    carried f32 that stays exactly 0.0) so XLA cannot hoist the op out of
    the loop; numerics are bit-identical to a direct call.

    EVERY leaf of fn's output feeds the carry. This matters: folding only
    the first leaf let XLA dead-code-eliminate the rest of the program —
    for grad-only timings the primal output was unused, so the FORWARD
    kernel was eliminated and every 'fwd+bwd' number in the round-4 tables
    before this fix measured the backward custom-call alone (confirmed
    against the in-model trace: Swin50 in-model fwd 0.52/bwd 0.99 ms vs
    probe fwd 0.51 / 'f+b' 0.97). Timing value_and_grad with all leaves
    consumed is the model-relevant fwd+bwd metric."""

    def scan_n(n):
        @jax.jit
        def run(qkv, scale, bias16):
            def body(c, _):
                out = fn(qkv, scale, bias16 + c)
                c2 = c
                for leaf in jax.tree_util.tree_leaves(out):
                    c2 = c2 + 1e-30 * leaf.ravel()[0].astype(jnp.float32)
                return c2, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return run

    f1, f2 = scan_n(iters), scan_n(2 * iters)
    float(f1(*args))
    float(f2(*args))
    best = float("inf")
    for _ in range(int(os.environ.get("ATTN_PROBE_REPS", "5"))):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters * 1e3)
    return best


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
    # Swin50 b=128 stage shapes (window 7; stem 112→56, strides 1,2,2,2)
    "sw3": dict(W=512, N=49, C=256, heads=8, nW=4, HW=14),
    "sw4": dict(W=128, N=49, C=512, heads=16, nW=1, HW=7),
}


def _call_v1(q, sc, b, m, heads, nW, block_rows):
    # stored_stats=False: the round-3 recompute backward (A/B baseline)
    return fwa.fused_window_attention(q, sc, b, heads, nW, m, block_rows,
                                      None, False)


def _call_v1s(q, sc, b, m, heads, nW, block_rows):
    # stored-stats backward: fwd saves per-head p/s_raw, bwd skips the
    # score/softmax recompute (round-4 design)
    return fwa.fused_window_attention(q, sc, b, heads, nW, m, block_rows,
                                      None, True)


def _call_v1b(q, sc, b, m, heads, nW, block_rows):
    # bf16 pre-proj output + bf16 incoming cotangent (model-path setting)
    return fwa.fused_window_attention(q, sc, b, heads, nW, m, block_rows,
                                      jnp.bfloat16, False
                                      ).astype(jnp.float32)


def _call_v1bs(q, sc, b, m, heads, nW, block_rows):
    # bf16 outputs + stored-stats backward (the full model-path candidate)
    return fwa.fused_window_attention(q, sc, b, heads, nW, m, block_rows,
                                      jnp.bfloat16, True
                                      ).astype(jnp.float32)


def _call_v2(q, sc, b, m, heads, nW, block_rows):
    # stored_stats=False: the recompute backward (A/B baseline)
    return fwa.fused_window_attention_packed(q, sc, b, heads, nW, m,
                                             block_rows, stored_stats=False)


def _call_v2s(q, sc, b, m, heads, nW, block_rows):
    # stored-stats backward: fwd stores the packed softmax, bwd skips the
    # score/softmax recompute (round-4 design, mirrors v1s)
    return fwa.fused_window_attention_packed(q, sc, b, heads, nW, m,
                                             block_rows, stored_stats=True)


def _call_v2b(q, sc, b, m, heads, nW, block_rows):
    # bf16 pre-proj output + bf16 incoming cotangent (model-path setting)
    return fwa.fused_window_attention_packed(
        q, sc, b, heads, nW, m, block_rows,
        out_dtype=jnp.bfloat16, stored_stats=False).astype(jnp.float32)


def _call_v2bs(q, sc, b, m, heads, nW, block_rows):
    # bf16 outputs + stored-stats backward (the full model-path candidate)
    return fwa.fused_window_attention_packed(
        q, sc, b, heads, nW, m, block_rows,
        out_dtype=jnp.bfloat16, stored_stats=True).astype(jnp.float32)


def _call_v2g(q, sc, b, m, heads, nW, block_rows, hg):
    return fwa.fused_window_attention_packed(q, sc, b, heads, nW, m,
                                             block_rows, False, None, hg,
                                             False)


def run_shape(name, masked, parity=False, timing=True):
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

    blocks = [int(b) for b in os.environ.get(
        "ATTN_PROBE_BLOCKS", "1024").split(",")]
    variants = {}
    for br in blocks:
        if not os.environ.get("ATTN_PROBE_ONLY_V2"):
            variants[f"v1 br={br}"] = functools.partial(
                _call_v1, heads=heads, nW=nW, block_rows=br)
            if os.environ.get("ATTN_PROBE_V1STATS"):
                variants[f"v1s br={br}"] = functools.partial(
                    _call_v1s, heads=heads, nW=nW, block_rows=br)
            if os.environ.get("ATTN_PROBE_V1BF16"):
                variants[f"v1b br={br}"] = functools.partial(
                    _call_v1b, heads=heads, nW=nW, block_rows=br)
                if os.environ.get("ATTN_PROBE_V1STATS"):
                    variants[f"v1bs br={br}"] = functools.partial(
                        _call_v1bs, heads=heads, nW=nW, block_rows=br)
        if os.environ.get("ATTN_PROBE_BATCHED"):
            # head-batched bodies (FR_ATTN_BATCHED, toggled per-variant in
            # the loop below — trace happens inside each iteration)
            variants[f"v1x br={br}"] = functools.partial(
                _call_v1, heads=heads, nW=nW, block_rows=br)
            if os.environ.get("ATTN_PROBE_V1BF16"):
                variants[f"v1xb br={br}"] = functools.partial(
                    _call_v1b, heads=heads, nW=nW, block_rows=br)
        if (hasattr(fwa, "fused_window_attention_packed")
                and not os.environ.get("ATTN_PROBE_NO_V2")):
            variants[f"v2 br={br}"] = functools.partial(
                _call_v2, heads=heads, nW=nW, block_rows=br)
            if os.environ.get("ATTN_PROBE_V1STATS"):
                variants[f"v2s br={br}"] = functools.partial(
                    _call_v2s, heads=heads, nW=nW, block_rows=br)
            if os.environ.get("ATTN_PROBE_V1BF16"):
                variants[f"v2b br={br}"] = functools.partial(
                    _call_v2b, heads=heads, nW=nW, block_rows=br)
                if os.environ.get("ATTN_PROBE_V1STATS"):
                    variants[f"v2bs br={br}"] = functools.partial(
                        _call_v2bs, heads=heads, nW=nW, block_rows=br)
            for hg in [int(h) for h in os.environ.get(
                    "ATTN_PROBE_GROUPS", "").split(",") if h]:
                if hg < heads and heads % hg == 0:
                    variants[f"v2g{hg} br={br}"] = functools.partial(
                        _call_v2g, heads=heads, nW=nW, block_rows=br, hg=hg)

    # parity vs the jnp oracle — errors reduced ON DEVICE (axon D2H of
    # >4 MB arrays can hang; verify-skill gotcha)
    def _oracle(q, sc, b):
        return fwa._heads_fwd(q, sc, b, mask, heads, q.dtype)

    def _gradof(fn):
        def gr(q, sc, b):
            return jax.grad(lambda *a: jnp.sum(fn(*a) * g),
                            argnums=(0, 1, 2))(q, sc, b)
        return gr

    def _relerr(fn_test, fn_ref):
        @jax.jit
        def err(q, sc, b):
            a = jax.tree_util.tree_leaves(fn_test(q, sc, b))
            r = jax.tree_util.tree_leaves(fn_ref(q, sc, b))
            return jnp.max(jnp.stack([
                jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
                / (jnp.max(jnp.abs(y.astype(jnp.float32))) + 1e-9)
                for x, y in zip(a, r)]))
        return float(err(qkv, scale, bias16))

    # ADVICE r4: only drive FR_ATTN_BATCHED when the probe itself is doing
    # the batched A/B (ATTN_PROBE_BATCHED set), and restore the caller's
    # value afterwards — otherwise a shell-level FR_ATTN_BATCHED=1 A/B
    # would be silently clobbered to the unbatched bodies.
    prior_batched = os.environ.get("FR_ATTN_BATCHED")
    for vname, f in variants.items():
        if os.environ.get("ATTN_PROBE_BATCHED"):
            os.environ["FR_ATTN_BATCHED"] = \
                "1" if vname.startswith("v1x") else "0"

        def _f3(q, sc, b, f=f):
            return f(q, sc, b, mask)
        pstr = ""
        if parity:
            err = _relerr(_f3, _oracle)
            gerr = _relerr(_gradof(_f3), _gradof(_oracle))
            pstr = f"relerr fwd {err:.2e} grad {gerr:.2e}"
        if not timing:
            print(f"{tag:8s} {vname:14s} {pstr}", flush=True)
            continue

        def fwd(q, sc, b, f=f):
            return f(q, sc, b, mask)
        t_f = bench(fwd, (qkv, scale, bias16))

        def gr(q, sc, b, f=f):
            def loss(q, sc, b):
                return jnp.sum(f(q, sc, b, mask) * g)
            # value_and_grad, primal consumed by bench's carry — grad-only
            # lets XLA eliminate the forward kernel (see bench docstring)
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, sc, b)
        t_b = bench(gr, (qkv, scale, bias16))
        print(f"{tag:8s} {vname:14s} fwd {t_f:7.3f} ms ({t_f/ffwd:5.1f}x floor)"
              f"   fwd+bwd {t_b:7.3f} ms ({t_b/(ffwd+fbwd):5.1f}x floor)"
              f"   {pstr}", flush=True)
    if os.environ.get("ATTN_PROBE_BATCHED"):
        if prior_batched is None:
            os.environ.pop("FR_ATTN_BATCHED", None)
        else:
            os.environ["FR_ATTN_BATCHED"] = prior_batched


def main():
    names = [a for a in sys.argv[1:] if a in SHAPES] or list(SHAPES)
    masked = "--masked" in sys.argv
    parity = "--parity" in sys.argv
    timing = "--no-timing" not in sys.argv
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for n in names:
        run_shape(n, False, parity, timing)
        if masked:
            run_shape(n, True, parity, timing)


if __name__ == "__main__":
    main()
