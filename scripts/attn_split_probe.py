"""Split the N=49 window-attention cost into MXU vs VPU components.

Round-5 candidate #1 decision probe: the one untried N=49 kernel design
(dense score packing via MXU placement dots) DOUBLES the tiny-dot count to
HALVE the score-shaped VPU lane padding. Whether that can win depends on
the MXU/VPU split of the current cost, which no probe has measured.

This times XLA (non-Pallas) programs for the isolated pieces at the Swin
shapes, with the same scan-differenced value-fetch timing as
attn_kernel_probe (imported). XLA's lowering differs from Mosaic's, so
the numbers are indicative of the SPLIT, not absolute kernel cost:

  dots    : the batched (W,h) score dot + out dot            (MXU piece)
  softmax : max/sub/exp/sum/div on the (W,h,N,N) f32 scores  (VPU piece)
  norms   : the q/k l2 normalisation                          (VPU piece)
  full    : the whole unfused attention forward (reference scale)

    python scripts/attn_split_probe.py [sw3 sw4 s4]
"""

import os
import sys

os.makedirs("/root/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.attn_kernel_probe import SHAPES, bench  # noqa: E402
from fr_tpu.models.common import l2_normalize  # noqa: E402
from fr_tpu.ops import fused_window_attn as fwa  # noqa: E402


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["sw3", "sw4"]
    for name in names:
        sh = SHAPES[name]
        W, N, C, h = sh["W"], sh["N"], sh["C"], sh["heads"]
        hd = C // h
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((W, N, 3 * C)), jnp.bfloat16)
        scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0,
                            jnp.float32)
        bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)

        def split(qkv):
            q = qkv[..., :C].reshape(W, N, h, hd)
            k = qkv[..., C:2 * C].reshape(W, N, h, hd)
            v = qkv[..., 2 * C:].reshape(W, N, h, hd)
            return q, k, v

        # NOTE on carry threading: bench() injects its scan carry via
        # bias16 + c, so EVERY piece must consume bias16 at its EARLIEST
        # input or XLA hoists the un-dependent prefix out of the timing
        # loop (first run of this probe: norms timed NEGATIVE, the score
        # dot was hoisted, and softmax rows summed to the constant 1 and
        # were DCE'd entirely).

        def dots_only(qkv, scale, bias16):
            # score dot + out dot, skipping norms/softmax
            q, k, v = split(qkv)
            q = q + bias16[0, 0, 0].astype(q.dtype)
            s = jnp.einsum("wnhd,wmhd->whnm", q, k,
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("whnm,wmhd->wnhd", s.astype(jnp.bfloat16), v,
                           preferred_element_type=jnp.float32)
            return o.reshape(W, N, C)

        def softmax_only(qkv, scale, bias16):
            # score-shaped VPU chain on a broadcast-built (W,h,N,N) tensor;
            # the build is one cheap outer-add, the chain is the payload.
            # Reduce over the NON-softmax axis so the result is not the
            # constant 1 (DCE bait).
            q, _, _ = split(qkv)
            s = (q[:, :, :, 0].transpose(0, 2, 1)[:, :, :, None]
                 .astype(jnp.float32) + bias16[None])
            p = jax.nn.softmax(s * scale[None, :, None, None], axis=-1)
            return jnp.sum(p, axis=-2)

        def norms_only(qkv, scale, bias16):
            q, k, _ = split(qkv)
            q = q + bias16[0, 0, 0].astype(q.dtype)
            k = k + bias16[0, 0, 1].astype(k.dtype)
            qn = l2_normalize(q.astype(jnp.float32))
            kn = l2_normalize(k.astype(jnp.float32))
            return (qn.astype(jnp.bfloat16).reshape(W, N, C)
                    + kn.astype(jnp.bfloat16).reshape(W, N, C))

        def full(qkv, scale, bias16):
            q, k, v = split(qkv)
            q = q + bias16[0, 0, 0].astype(q.dtype)  # carry at the input
            qn = l2_normalize(q.astype(jnp.float32)).astype(jnp.bfloat16)
            kn = l2_normalize(k.astype(jnp.float32)).astype(jnp.bfloat16)
            s = jnp.einsum("wnhd,wmhd->whnm", qn, kn,
                           preferred_element_type=jnp.float32)
            s = s * scale[None, :, None, None] + bias16[None]
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("whnm,wmhd->wnhd", p.astype(jnp.bfloat16), v,
                           preferred_element_type=jnp.float32)
            return o.reshape(W, N, C)

        def full_fb(qkv, scale, bias16):
            return jax.value_and_grad(
                lambda *a: full(*a).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))(qkv, scale, bias16)

        def kernel_fwd(qkv, scale, bias16):
            return fwa.fused_window_attention(
                qkv, scale, bias16, h, sh["nW"], None, 1024, jnp.bfloat16)

        def kernel_fb(qkv, scale, bias16):
            return jax.value_and_grad(
                lambda *a: kernel_fwd(*a).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))(qkv, scale, bias16)

        args = (qkv, scale, bias16)
        print(f"== {name} (W={W} N={N} C={C} h={h}) XLA piece timings, ms:")
        for label, fn in (("dots", dots_only), ("softmax", softmax_only),
                          ("norms", norms_only), ("full", full),
                          ("full f+b", full_fb),
                          ("kernel", kernel_fwd), ("kernel f+b", kernel_fb)):
            print(f"   {label:10s} {bench(fn, args):7.3f}")


if __name__ == "__main__":
    main()
