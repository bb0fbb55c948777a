"""Per-shape GEMM/conv floor audit of an encoder's fwd+bwd MXU work.

Walks the accounting jaxpr (unfused-attention encoder, same convention as
bench.py's roofline denominator) and prints the occupancy-aware floor time
of every dot/conv SHAPE CLASS, fwd and derived-bwd separately. Purpose
(ROUND4_NOTES round-5 candidate #2): compare the dot-floor subtotal
against the measured 'fusion' family of the step trace to see whether the
transformer families' GEMMs carry slack the conv path does not.

    python scripts/gemm_audit.py [Swin50] [batch]

CPU-only (make_jaxpr, no compile, no TPU).
"""

import math
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fr_tpu.configs import load_config  # noqa: E402
from fr_tpu.models import build_encoder  # noqa: E402
from fr_tpu.utils import flops as F  # noqa: E402

PEAK = 197e12  # v5e bf16


def audit(jaxpr, rows):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            f = F._dot_flops(eqn)
            a = eqn.invars[0].aval.shape
            b = eqn.invars[1].aval.shape
            (lc, _), _ = eqn.params["dimension_numbers"]
            k = math.prod(a[i] for i in lc)
            occ = min(k, 128) / 128.0
            pen = F._eqn_dtype_penalty(eqn)
            key = ("dot", a, b)
            rows[key][0] += pen * f / occ / PEAK
            rows[key][1] += pen * 2.0 * f / PEAK
            rows[key][2] += 1
        elif name == "conv_general_dilated":
            f = F._conv_flops(eqn)
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            cin = rhs[dn.rhs_spec[1]]
            cout = rhs[dn.rhs_spec[0]]
            k_spatial = math.prod(rhs[i] for i in dn.rhs_spec[2:])
            k_eff = cin if cin >= 8 else cin * k_spatial
            occ_f = min(k_eff, 128) / 128.0
            occ_b = min(cout, 128) / 128.0
            pen = F._eqn_dtype_penalty(eqn)
            bwd = f / occ_b + (f / occ_b if cin >= 8 else 0.0)
            key = ("conv", eqn.invars[0].aval.shape, rhs)
            rows[key][0] += pen * f / occ_f / PEAK
            rows[key][1] += pen * bwd / PEAK
            rows[key][2] += 1
        elif name == "scan":
            inner = defaultdict(lambda: [0.0, 0.0, 0])
            audit(eqn.params["jaxpr"].jaxpr, inner)
            for kk, vv in inner.items():
                rows[kk][0] += eqn.params["length"] * vv[0]
                rows[kk][1] += eqn.params["length"] * vv[1]
                rows[kk][2] += eqn.params["length"] * vv[2]
        elif name == "pallas_call":
            inner = defaultdict(lambda: [0.0, 0.0, 0])
            audit(F._as_jaxpr(eqn.params["jaxpr"]), inner)
            g = F._pallas_grid_size(eqn)
            for kk, vv in inner.items():
                rows[kk][0] += g * vv[0]
                rows[kk][1] += g * vv[1]
                rows[kk][2] += int(g * vv[2])
        else:
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(k)
                if sub is not None:
                    audit(F._as_jaxpr(sub), rows)
                    break


def main():
    network = sys.argv[1] if len(sys.argv) > 1 else "Swin50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    conf = load_config("ms1m_arcface_122", network=network)
    conf.mixed_precision = True
    conf.fused_attn = False  # accounting convention: intrinsic math only
    enc = build_encoder(conf)
    x = jnp.zeros((batch, conf.img_size, conf.img_size, 3), jnp.bfloat16)
    variables = jax.eval_shape(lambda: enc.init(jax.random.key(0),
                                                x, train=False))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          variables["params"])
    bstats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          variables.get("batch_stats", {}))

    fwd = lambda p, b, im: enc.apply(  # noqa: E731
        {"params": p, "batch_stats": b}, im, train=False)
    rows = defaultdict(lambda: [0.0, 0.0, 0])
    audit(jax.make_jaxpr(fwd)(params, bstats, x).jaxpr, rows)

    dot_t = sum(v[0] + v[1] for k, v in rows.items() if k[0] == "dot")
    conv_t = sum(v[0] + v[1] for k, v in rows.items() if k[0] == "conv")
    print(f"== {network} b={batch}: occupancy-aware MXU floor (fwd+bwd)")
    print(f"   dots : {dot_t*1e3:7.3f} ms")
    print(f"   convs: {conv_t*1e3:7.3f} ms")
    print(f"   total: {(dot_t+conv_t)*1e3:7.3f} ms")
    print("-- per shape class (floor ms, fwd / bwd, count):")
    for k, v in sorted(rows.items(), key=lambda kv: -(kv[1][0] + kv[1][1])):
        kind, a, b = k
        tot = (v[0] + v[1]) * 1e3
        if tot < 0.01:
            continue
        print(f"   {tot:7.3f}  ({v[0]*1e3:6.3f} fwd + {v[1]*1e3:6.3f} bwd)"
              f"  ×{v[2]:<4d} {kind}  {a} · {b}")


if __name__ == "__main__":
    main()
