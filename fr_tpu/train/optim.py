"""Hand-rolled optimizers with exact torch-semantics.

The encoder uses dense SGD-momentum / AdamW; the PartialFC head uses
sampled-row (sparse) variants that gather the activated rows, update them,
and scatter them back — the functional replacement for the reference's
optimizer-state swap (reference nets/PartialFC.py:120-131, 317-327).

torch semantics reproduced:
- SGD: g ← g + wd·p ; buf ← mom·buf + g ; p ← p − lr·buf
  (zero-initialised momentum buffers make the first step identical to torch's
  buf←g bootstrap).
- AdamW: p ← p·(1 − lr·wd) ; m ← β1·m + (1−β1)·g ; v ← β2·v + (1−β2)·g² ;
  p ← p − lr/(1−β1ᵗ) · m / (√v/√(1−β2ᵗ) + eps).
- global-norm clip: coef = max_norm / (‖g‖ + 1e-6), applied iff coef < 1
  (torch clip_grad_norm_; applied to encoder grads only, max_norm=5,
  reference model/FR_PartialFC.py:181).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def take_rows(a, idx):
    """Gather rows by a SORTED, UNIQUE index vector (sampled class columns are
    top-k outputs, sorted and duplicate-free) — the hints let XLA:TPU emit a
    vectorised gather instead of a serialised per-row loop."""
    return jnp.take(a, idx, axis=0, unique_indices=True,
                    indices_are_sorted=True)


def put_rows(a, idx, vals):
    """Scatter rows back (sorted, unique indices — vectorised lowering)."""
    return a.at[idx].set(vals, unique_indices=True, indices_are_sorted=True)


def clip_by_global_norm(grads: Pytree, max_norm: float) -> Tuple[Pytree, jnp.ndarray]:
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    return jax.tree.map(lambda g: g * coef, grads), total


# ---------------------------------------------------------------------------
# Dense (encoder) updates.
# ---------------------------------------------------------------------------

def init_slots(optimizer: str, params: Pytree) -> Dict[str, Pytree]:
    z = lambda: jax.tree.map(jnp.zeros_like, params)
    if optimizer == "SGD":
        return {"momentum": z()}
    if optimizer == "AdamW":
        return {"exp_avg": z(), "exp_avg_sq": z()}
    raise ValueError(optimizer)


def sgd_update(params: Pytree, grads: Pytree, slots: Dict[str, Pytree],
               lr, wd: float, mom: float) -> Tuple[Pytree, Dict[str, Pytree]]:
    def upd(p, g, b):
        g = g + wd * p
        b = mom * b + g
        return p - lr * b, b
    out = jax.tree.map(upd, params, grads, slots["momentum"])
    new_p = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_b = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_p, {"momentum": new_b}


def adamw_update(params: Pytree, grads: Pytree, slots: Dict[str, Pytree],
                 lr, wd: float, b1: float, b2: float, eps: float,
                 count) -> Tuple[Pytree, Dict[str, Pytree]]:
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, m, v):
        p = p * (1.0 - lr * wd)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        p = p - (lr / bc1) * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps)
        return p, m, v

    out = jax.tree.map(upd, params, grads, slots["exp_avg"], slots["exp_avg_sq"])
    pick = lambda i: jax.tree.map(lambda t: t[i], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
    return pick(0), {"exp_avg": pick(1), "exp_avg_sq": pick(2)}


def encoder_update(optimizer: str, conf, params, grads, slots, lr, count):
    """Dispatch by conf.optimizer (reference model/FR_PartialFC.py:437-449)."""
    if optimizer == "SGD":
        return sgd_update(params, grads, slots, lr, conf.wd, conf.mom)
    if optimizer == "AdamW":
        b1, b2 = conf.betas
        return adamw_update(params, grads, slots, lr, conf.wd, b1, b2,
                            conf.eps, count)
    raise ValueError(optimizer)


# ---------------------------------------------------------------------------
# Sampled-row (PartialFC head) updates: gather → update → scatter.
# ---------------------------------------------------------------------------

def row_sgd_update(weight, slots, idx, grad_rows, lr, wd: float, mom: float):
    """Update only the sampled rows, exactly like the reference's swapped-in
    torch.SGD step on weight_activated (reference nets/PartialFC.py:120-143).
    idx=None means all rows (sample_rate == 1 full softmax)."""
    w = weight if idx is None else take_rows(weight, idx)
    b = slots["momentum"] if idx is None else take_rows(slots["momentum"], idx)
    g = grad_rows + wd * w
    b = mom * b + g
    w = w - lr * b
    if idx is None:
        return w, {"momentum": b}
    return (put_rows(weight, idx, w),
            {"momentum": put_rows(slots["momentum"], idx, b)})


def row_adamw_update(weight, slots, idx, grad_rows, lr, wd: float, b1: float,
                     b2: float, eps: float, count):
    """Sampled-row AdamW with a single shared step counter, matching the
    reference's injected state['step'] (reference nets/PartialFC.py:317-327)."""
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    w0 = weight if idx is None else take_rows(weight, idx)
    m0 = slots["exp_avg"] if idx is None else take_rows(slots["exp_avg"], idx)
    v0 = (slots["exp_avg_sq"] if idx is None
          else take_rows(slots["exp_avg_sq"], idx))
    w = w0 * (1.0 - lr * wd)
    m = b1 * m0 + (1.0 - b1) * grad_rows
    v = b2 * v0 + (1.0 - b2) * jnp.square(grad_rows)
    w = w - (lr / bc1) * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps)
    if idx is None:
        return w, {"exp_avg": m, "exp_avg_sq": v}
    return (put_rows(weight, idx, w),
            {"exp_avg": put_rows(slots["exp_avg"], idx, m),
             "exp_avg_sq": put_rows(slots["exp_avg_sq"], idx, v)})


def pfc_row_update_grouped(optimizer: str, conf, weight, slots, idx2d,
                           grad_rows, lr, count, model_size: int):
    """GSPMD variant of the sampled-row update: weight viewed as
    (model_size, num_local, D), per-shard index rows (model_size, num_sample)
    gathered/scattered with take_along_axis so XLA provably keeps the
    gather/scatter local to each 'model' shard."""
    C, D = weight.shape
    nl = C // model_size
    ns = idx2d.shape[1]
    rows = jnp.arange(model_size)[:, None]

    def take3(a):
        a3 = a.reshape(model_size, nl, D)
        return jnp.take_along_axis(a3, idx2d[:, :, None], axis=1)

    def put3(a, vals):
        a3 = a.reshape(model_size, nl, D)
        a3 = a3.at[rows, idx2d].set(vals, unique_indices=True,
                                    indices_are_sorted=True)
        return a3.reshape(C, D)

    g = grad_rows.reshape(model_size, ns, D)
    if optimizer == "SGD":
        w = take3(weight)
        b = take3(slots["momentum"])
        gg = g + conf.wd * w
        b = conf.mom * b + gg
        w = w - lr * b
        return put3(weight, w), {"momentum": put3(slots["momentum"], b)}
    if optimizer == "AdamW":
        b1, b2 = conf.betas
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        w = take3(weight) * (1.0 - lr * conf.wd)
        m = b1 * take3(slots["exp_avg"]) + (1.0 - b1) * g
        v = b2 * take3(slots["exp_avg_sq"]) + (1.0 - b2) * jnp.square(g)
        w = w - (lr / bc1) * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + conf.eps)
        return put3(weight, w), {"exp_avg": put3(slots["exp_avg"], m),
                                 "exp_avg_sq": put3(slots["exp_avg_sq"], v)}
    raise ValueError(optimizer)


def pfc_row_update(optimizer: str, conf, weight, slots, idx, grad_rows, lr,
                   count, gidx=None, block: int = 1):
    """gidx/block: block-aligned sampling (PFCConfig.sample_block > 1) takes
    the fused Pallas in-place grouped update — ~7.5× XLA's sampled-row
    gather/update/scatter at WebFace42M scale (fr_tpu/ops/sparse_rows.py)."""
    if gidx is not None and block > 1:
        from fr_tpu.ops.sparse_rows import grouped_update
        return grouped_update(optimizer, conf, weight, slots, gidx,
                              grad_rows, lr, count, block)
    if optimizer == "SGD":
        return row_sgd_update(weight, slots, idx, grad_rows, lr, conf.wd, conf.mom)
    if optimizer == "AdamW":
        b1, b2 = conf.betas
        return row_adamw_update(weight, slots, idx, grad_rows, lr, conf.wd,
                                b1, b2, conf.eps, count)
    raise ValueError(optimizer)
