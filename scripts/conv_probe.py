"""Per-shape conv microbenchmark: find which R100 stage underperforms.

For each stage shape of ResNet100-IR at b=256 (56²×64, 28²×128, 14²×256,
7²×512), times a stack of 3×3 bf16 convs fwd and fwd+bwd and prints achieved
TF/s, plus variants (f32 BN between convs, NCHW-ish feature dims) to
localise the roofline gap. Run from /root/repo on the TPU.
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
from jax import lax  # noqa: E402


def fetch(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(fn, *args, n=10):
    fetch(fn(*args))
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn(*args)
    fetch(fn(*args))
    return (time.perf_counter() - t0) / n


def conv(x, w):
    # bf16 in / bf16 out, like flax nn.Conv with dtype=bfloat16 (the model's
    # configuration); MXU still accumulates f32 internally
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_stack(depth, bn):
    def fwd(x, ws, scales):
        x = x.astype(jnp.bfloat16)  # grads flow through the cast (f32 cot)
        for i in range(depth):
            y = conv(x, ws[i])
            if bn:
                # mimic the f32-BN-between-convs pattern: normalise with
                # batch stats in f32, then cast back to bf16
                y = y.astype(jnp.float32)
                m = jnp.mean(y, axis=(0, 1, 2), keepdims=True)
                v = jnp.var(y, axis=(0, 1, 2), keepdims=True)
                y = (y - m) * jax.lax.rsqrt(v + 1e-5) * scales[i]
            x = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))
    return fwd


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    shapes = [(56, 64, 6), (28, 128, 26), (14, 256, 60), (7, 512, 8)]
    depth = 6
    for hw, c, n_convs in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
        ws = [jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)),
                          jnp.bfloat16) for _ in range(depth)]
        scales = [jnp.ones((1, 1, 1, c), jnp.float32) for _ in range(depth)]
        flops = 2 * b * hw * hw * 9 * c * c * depth

        for bn in (False, True):
            f = make_stack(depth, bn)
            jf = jax.jit(f)
            t = timeit(jf, x, ws, scales)

            def fb(x, ws, scales):
                l, g = jax.value_and_grad(
                    lambda xx: f(xx, ws, scales))(x)
                return l + 0.0 * jnp.sum(g.astype(jnp.float32))
            jfb = jax.jit(fb)
            t2 = timeit(jfb, x, ws, scales)
            tag = "bn" if bn else "  "
            print(f"{hw:3d}x{hw:<3d} c={c:<4d} {tag} "
                  f"fwd {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s | "
                  f"fwd+bwd {t2*1e3:7.2f} ms {3*flops/t2/1e12:6.1f} TF/s "
                  f"(bwd {2*flops/(t2-t)/1e12:6.1f})", flush=True)


if __name__ == "__main__":
    main()
