"""Optimizer-lowering experiment: per-leaf tree.map clip+SGD (318 kernels)
vs flat-buffer variants (ravel once, one fused update). Decides the
encoder_update implementation (VERDICT #2b). Run from /root/repo on TPU.
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
from jax.flatten_util import ravel_pytree  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fr_tpu.configs import load_config  # noqa: E402
from fr_tpu.models import build_encoder  # noqa: E402


def fetch(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(fn, *args, n=20):
    fetch(fn(*args))
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn(*args)
    fetch(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    conf = load_config("ms1m_arcface_122", network="ResNet100")
    conf.mixed_precision = True
    enc = build_encoder(conf)
    x = jnp.zeros((2, conf.img_size, conf.img_size, 3), jnp.float32)
    variables = jax.jit(lambda: enc.init(jax.random.key(0), x,
                                         train=False))()
    params = variables["params"]
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"{n_leaves} leaves, {n_params/1e6:.1f}M params")

    grads = jax.tree.map(lambda p: p * 1e-3, params)
    mom = jax.tree.map(jnp.zeros_like, params)
    lr, wd, m_ = jnp.float32(0.05), 5e-4, 0.9

    # A: current per-leaf tree.map clip + SGD
    @jax.jit
    def per_leaf(p, g, b):
        leaves = jax.tree.leaves(g)
        total = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                             for x in leaves))
        coef = jnp.minimum(5.0 / (total + 1e-6), 1.0)
        g = jax.tree.map(lambda x: x * coef, g)

        def upd(p_, g_, b_):
            g_ = g_ + wd * p_
            b_ = m_ * b_ + g_
            return p_ - lr * b_, b_
        out = jax.tree.map(upd, p, g, b)
        is_t = lambda t: isinstance(t, tuple)
        return (jax.tree.map(lambda t: t[0], out, is_leaf=is_t),
                jax.tree.map(lambda t: t[1], out, is_leaf=is_t))

    tA = timeit(per_leaf, params, grads, mom)
    print(f"A per-leaf:              {tA*1e3:7.2f} ms")

    # B: full flat round-trip (ravel p/g/b, fused update, unravel both)
    @jax.jit
    def flat_roundtrip(p, g, b):
        fp, unravel = ravel_pytree(p)
        fg, _ = ravel_pytree(g)
        fb, _ = ravel_pytree(b)
        total = jnp.sqrt(jnp.sum(jnp.square(fg)))
        coef = jnp.minimum(5.0 / (total + 1e-6), 1.0)
        fg = fg * coef + wd * fp
        fb = m_ * fb + fg
        fp = fp - lr * fb
        return unravel(fp), unravel(fb)

    tB = timeit(flat_roundtrip, params, grads, mom)
    print(f"B flat roundtrip:        {tB*1e3:7.2f} ms")

    # C: momentum kept flat in state (no unravel of b), params unraveled
    fb0, _ = ravel_pytree(mom)

    @jax.jit
    def flat_mom(p, g, fb):
        fp, unravel = ravel_pytree(p)
        fg, _ = ravel_pytree(g)
        total = jnp.sqrt(jnp.sum(jnp.square(fg)))
        coef = jnp.minimum(5.0 / (total + 1e-6), 1.0)
        fg = fg * coef + wd * fp
        fb = m_ * fb + fg
        fp = fp - lr * fb
        return unravel(fp), fb

    tC = timeit(flat_mom, params, grads, fb0)
    print(f"C flat mom state:        {tC*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
