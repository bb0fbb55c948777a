"""A/B probe (VERDICT r3 next #4): Pallas grouped_gather vs reshaped XLA
take on the WebFace42M sampled-head shape.

The reshaped formulation treats each aligned group as ONE logical row:
    w.reshape(C//blk, blk*D) ; take(gidx) ; reshape(ng*blk, D)
— if XLA's gather moves (blk*D)-sized rows at HBM speed, the 3-line jnp
form can retire the Pallas gather kernel. Timing uses the scan-differenced
value-fetch method (axon's block_until_ready returns early).

  PROBE_C / PROBE_S / PROBE_D / PROBE_BLOCKS env override the shape.
  python scripts/gather_ab_probe.py
"""

import os
import time

import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fr_tpu.ops import sparse_rows as sr  # noqa: E402

C = int(os.environ.get("PROBE_C", str(2_059_904)))
S = int(os.environ.get("PROBE_S", str(204_800)))
D = int(os.environ.get("PROBE_D", "512"))
BLOCKS = [int(b) for b in os.environ.get("PROBE_BLOCKS", "32,64").split(",")]
HBM_GBPS = 800.0


def bench(fn, args, iters=8):
    """Scan-differenced timing with the carry threaded through gidx — the
    carry stays exactly 0 but depends on each iteration's output, so XLA
    cannot hoist the gather out of the loop (it did when the carry only
    CONSUMED the output: loop-invariant code motion emptied the scan and
    the probe printed negative times)."""
    def scan_n(n):
        @jax.jit
        def run(table, gidx):
            def body(c, _):
                out = fn(table, gidx + c)
                c2 = jnp.minimum(
                    c + jnp.isnan(out[0, 0]).astype(jnp.int32), 1)
                return c2, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c
        return run
    f1, f2 = scan_n(iters), scan_n(2 * iters)
    float(f1(*args))
    float(f2(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters * 1e3)
    return best


def main():
    print(f"backend={jax.default_backend()} C={C} S={S} D={D}")
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    floor = S * D * 4 * 2 / HBM_GBPS / 1e6  # read rows + write out
    for blk in BLOCKS:
        ng = S // blk
        gidx = jnp.asarray(np.sort(rng.choice(C // blk, ng, replace=False))
                           .astype(np.int32))

        def pallas_g(t, gi):
            return sr.grouped_gather(t, gi, blk)

        def reshaped_take(t, gi):
            t2 = t.reshape(C // blk, blk * D)
            return jnp.take(t2, gi, axis=0, unique_indices=True,
                            indices_are_sorted=True).reshape(ng * blk, D)

        # correctness first
        a = np.asarray(jax.jit(pallas_g)(table, gidx)[:2048])
        b = np.asarray(jax.jit(reshaped_take)(table, gidx)[:2048])
        assert np.array_equal(a, b), "mismatch!"

        t_p = bench(pallas_g, (table, gidx))
        t_r = bench(reshaped_take, (table, gidx))
        print(f"block={blk:3d}  pallas {t_p:7.3f} ms ({t_p/floor:4.1f}x floor)"
              f"   reshaped-take {t_r:7.3f} ms ({t_r/floor:4.1f}x floor)",
              flush=True)


if __name__ == "__main__":
    main()
