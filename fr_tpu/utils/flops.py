"""Analytic FLOP counting by walking a jaxpr.

Counts matmul (dot_general) and convolution (conv_general_dilated) FLOPs —
the MXU work that dominates encoder cost — for roofline reporting
(BASELINE.md: ≥95% of roofline imgs/sec/chip target).
"""

from __future__ import annotations

import math

import jax


def _dot_flops(eqn) -> float:
    a = eqn.invars[0].aval.shape
    b = eqn.invars[1].aval.shape
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(a[i] for i in lb)
    m = math.prod(a[i] for i in range(len(a)) if i not in tuple(lc) + tuple(lb))
    k = math.prod(a[i] for i in lc)
    n = math.prod(b[i] for i in range(len(b)) if i not in tuple(rc) + tuple(rb))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    bgc = eqn.params.get("batch_group_count", 1)
    # output spatial * batch * out_channels
    out_elems = math.prod(out)
    # kernel spatial * in_channels_per_group
    k_spatial = math.prod(rhs[i] for i in dn.rhs_spec[2:])
    cin_per_group = rhs[dn.rhs_spec[1]]
    return 2.0 * out_elems * k_spatial * cin_per_group / max(bgc, 1)


def count_flops(fn, *args, **kwargs) -> float:
    """Total dot/conv FLOPs of fn(*args) by jaxpr traversal (recurses into
    pjit/custom_jvp/scan/while/cond sub-jaxprs; scan multiplies by length)."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _walk(jaxpr.jaxpr)


def _walk(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _walk(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # unknowable trip count; count one iteration
            total += _walk(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_walk(b.jaxpr) for b in branches)
        else:
            for k in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(k)
                if sub is not None:
                    total += _walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
                    break
    return total
