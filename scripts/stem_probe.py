"""Stem-conv formulations, device-truth timing via XPlane.

The R100 stem conv (3->64, 3x3 s1, 112^2, b=256) measures 1.73 ms/step in
the train-step trace -- ~3% of MXU peak: XLA:TPU lowers the 3-channel
contraction tap-by-tap (K=3 per pass, 3/128 deep). Candidates:

  A. lax.conv baseline
  B. im2col: 9 shifted slices concatenated on C -> [b,112,112,27], then a
     1x1 conv (a single K=27 GEMM; 27/128 deep, so ceiling ~21% of peak,
     ~7x the K=3 ceiling)
  C. im2col + explicit dot on the flattened [M,27]@[27,64]

Each candidate runs in a jitted loop of `iters` chained applications (the
output feeds a cheap reduction back into the input's first channels so XLA
cannot hoist), profiled with jax.profiler; per-op times are read from the
XPlane 'XLA Ops' line. Chaining makes per-call overhead negligible.

    python scripts/stem_probe.py [batch]
"""

import glob
import os
import sys
from collections import defaultdict

import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

H = W = 112


def conv_a(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_b(x, w):
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pat = jnp.concatenate([xp[:, dh:dh + H, dw:dw + W, :]
                           for dh in range(3) for dw in range(3)], axis=-1)
    return lax.conv_general_dilated(
        pat, w.reshape(1, 1, 27, 64), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_c(x, w):
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pat = jnp.concatenate([xp[:, dh:dh + H, dw:dw + W, :]
                           for dh in range(3) for dw in range(3)], axis=-1)
    out = pat.reshape(-1, 27) @ w.reshape(27, 64)
    return out.reshape(b, H, W, 64)


def chained(fn, iters):
    def run(x, w):
        def body(x, _):
            y = fn(x, w)
            # feed 3 channels of the output back in so iterations chain
            x2 = x.at[..., :3].add(0.001 * y[..., :3])
            return x2, y[0, 0, 0, 0]
        x, outs = lax.scan(body, x, None, length=iters)
        return outs.sum()
    return jax.jit(run)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, H, W, 3)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, 3, 64)), jnp.bfloat16)

    fns = {"A lax.conv": conv_a, "B im2col+1x1conv": conv_b,
           "C im2col+dot": conv_c}
    # parity first — compute the delta ON DEVICE (D2H of the full activation
    # is GBs over the tunnel and can hang; fetch only the scalar max)
    def max_delta(fn1, fn2, x, w):
        return jnp.max(jnp.abs(fn1(x, w).astype(jnp.float32)
                               - fn2(x, w).astype(jnp.float32)))
    from functools import partial
    for name, fn in list(fns.items())[1:]:
        err = float(jax.jit(partial(max_delta, conv_a, fn))(x, w))
        print(f"{name}: max|delta vs A| = {err:.4f}", flush=True)
        assert err < 0.25, (name, err)

    jitted = {name: chained(fn, iters) for name, fn in fns.items()}
    for name, fn in jitted.items():
        float(fn(x, w))  # compile+warm

    trace_dir = "/tmp/stem_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for name, fn in jitted.items():
            float(fn(x, w))

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    plane = next(p for p in pd.planes if "TPU" in p.name)
    line = next(l for l in plane.lines if l.name == "XLA Ops")
    agg = defaultdict(float)
    for ev in line.events:
        agg[ev.name.split(" = ")[0]] += ev.duration_ns / 1e6
    print(f"-- top ops over {iters} iters of A,B,C (ms total):")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {dur:8.3f}  {name[:100]}")

    jit_line = next((l for l in plane.lines if "XLA Modules" in l.name), None)
    if jit_line:
        for ev in jit_line.events:
            print(f"module {ev.name[:60]}: {ev.duration_ns/1e6:.3f} ms")


if __name__ == "__main__":
    main()
