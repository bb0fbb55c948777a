"""Mosaic-level split of the N=49 per-head backward kernel's cost.

attn_split_probe.py showed the intrinsic math is tiny in XLA's lowering
(all W·h tiny dots batched in 0.03–0.07 ms at sw4) while the real Mosaic
backward runs 0.65–0.81 ms — so the cost is inside the kernel structure.
This probe times two degenerate Pallas bodies that mirror the real
_bwd_body's structure but keep only one cost class each:

  dots : the 5 per-head MXU dots (score recompute, dp, dv, dqn, dkn) with
         direct lane-offset stores — no norms, no softmax, no VJP chains
  vpu  : the per-head VPU work (2 norms, softmax, softmax VJP, 2 norm-VJP
         chains) on broadcast-built score tensors — no MXU dots
  real : the shipping backward (via the op's VJP) for scale

If dots + vpu ≈ real, the split directly apportions the kernel time; a
large residual means staging/pipelining overhead dominates instead.

    python scripts/attn_mosaic_split_probe.py [sw3 sw4]

NOT a parity program — the degenerate bodies compute nonsense on purpose.
"""

import functools
import os
import sys

os.makedirs("/root/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.attn_kernel_probe import SHAPES, bench  # noqa: E402
from fr_tpu.ops import fused_window_attn as fwa  # noqa: E402


def _dots_body(qkv_ref, scale_ref, bias_ref, g_ref, dqkv_ref, dscale_ref,
               dbias_ref, num_heads, compute):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    qkv = qkv_ref[:]
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    bias16 = bias_ref[:]
    g = g_ref[:]
    dscales = []
    for h in range(num_heads):
        o = h * hd
        qh = qkv[:, :, o:o + hd].astype(compute)
        kh = qkv[:, :, C + o:C + o + hd].astype(compute)
        vh = qkv[:, :, 2 * C + o:2 * C + o + hd]
        s = lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        s = s + bias16[h, 0, 0]          # carry dependence, no VPU chain
        g_h = g[:, :, o:o + hd]
        dp = lax.dot_general(g_h.astype(compute), vh,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dv = lax.dot_general(s.astype(compute), g_h.astype(compute),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dsc = dp.astype(compute)
        dqn = lax.dot_general(dsc, kh, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dkn = lax.dot_general(dsc, qh, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dt = dqkv_ref.dtype
        dqkv_ref[:, :, o:o + hd] = dqn.astype(dt)
        dqkv_ref[:, :, C + o:C + o + hd] = dkn.astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + hd] = dv.astype(dt)
        dscales.append(jnp.sum(dv))
    dscale_ref[:] += jnp.stack(dscales).reshape(1, num_heads)


def _vpu_body(qkv_ref, scale_ref, bias_ref, g_ref, dqkv_ref, dscale_ref,
              dbias_ref, num_heads, compute):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    qkv = qkv_ref[:]
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    scale = scale_ref[0]
    bias16 = bias_ref[:]
    g = g_ref[:]
    dscales = []
    for h in range(num_heads):
        o = h * hd
        qh = qkv[:, :, o:o + hd].astype(jnp.float32)
        kh = qkv[:, :, C + o:C + o + hd].astype(jnp.float32)
        qn, qr, qa = fwa._norm(qh)
        kn, kr, ka = fwa._norm(kh)
        # broadcast-built score stand-ins (no MXU): same shapes/dtypes as
        # the real chain. ATTN_VPU_NO_EXP=1 swaps the exp for a multiply
        # (same tensor shapes/passes) to price the transcendental alone.
        s = qn[:, :, :1] * kn[:, :, :1].transpose(0, 2, 1)
        s = s * scale[h] + bias16[h][None]
        if os.environ.get("ATTN_VPU_NO_EXP", "0") == "1":
            m_sh = jnp.max(s, axis=-1, keepdims=True)
            e = (s - m_sh) * 1.0009765625      # stand-in for exp, same pass
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        else:
            p = jax.nn.softmax(s, axis=-1)
        g_h = g[:, :, o:o + hd].astype(jnp.float32)
        dp = p + g_h[:, :, :1]           # score-shaped stand-in for g·vᵀ
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0)
        ds_raw = ds * scale[h]
        dqn = ds_raw[:, :, :1] * kn      # (W,N,hd) stand-in for dsc·kn
        dkn = ds_raw[:, :, :1] * qn
        dq = qr * (dqn - jnp.where(
            qa, qn * jnp.sum(dqn * qn, axis=-1, keepdims=True), 0.0))
        dk = kr * (dkn - jnp.where(
            ka, kn * jnp.sum(dkn * kn, axis=-1, keepdims=True), 0.0))
        dt = dqkv_ref.dtype
        dqkv_ref[:, :, o:o + hd] = dq.astype(dt)
        dqkv_ref[:, :, C + o:C + o + hd] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + hd] = dq.astype(dt)
        dscales.append(jnp.sum(dqn * qn))
    dscale_ref[:] += jnp.stack(dscales).reshape(1, num_heads)


def make_variant(body, W, N, C, num_heads, block_rows=1024):
    C3 = 3 * C
    wb = fwa._pick_block(W, N, 1, target_rows=block_rows)
    grid = (W // wb,)
    kern = functools.partial(body, num_heads=num_heads,
                             compute=jnp.bfloat16)
    in_specs = fwa._specs(grid[0], wb, N, C3, num_heads, False, 1)
    in_specs.append(pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))

    def run(qkv, scale, bias16):
        g = qkv[:, :, :C]
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, num_heads), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((W, N, C3), jnp.bfloat16),
                jax.ShapeDtypeStruct((1, num_heads), jnp.float32),
                jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32),
            ],
            compiler_params=fwa._ATTN_COMPILER_PARAMS,
        )(qkv, jnp.reshape(scale, (1, num_heads)), bias16, g)

    return run


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["sw3", "sw4"]
    for name in names:
        sh = SHAPES[name]
        W, N, C, h = sh["W"], sh["N"], sh["C"], sh["heads"]
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((W, N, 3 * C)), jnp.bfloat16)
        scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0,
                            jnp.float32)
        bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
        args = (qkv, scale, bias16)

        def real_bwd(qkv, scale, bias16):
            return jax.grad(
                lambda *a: fwa.fused_window_attention(
                    a[0], a[1], a[2], h, sh["nW"], None, 1024, jnp.bfloat16,
                    stored_stats=False).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))(qkv, scale, bias16)

        print(f"== {name} (W={W} N={N} C={C} h={h}) Mosaic bwd split, ms:")
        for label, fn in (("dots", make_variant(_dots_body, W, N, C, h)),
                          ("vpu", make_variant(_vpu_body, W, N, C, h)),
                          ("real f+b", real_bwd)):
            print(f"   {label:9s} {bench(fn, args):7.3f}")


if __name__ == "__main__":
    main()
