"""Margin-softmax logit transforms (functional).

Semantics match the reference's in-place logit mutations
(reference nets/ArcFace.py:5-106) expressed functionally: rows whose label is
-1 (not owned by this class shard / filtered) are left untouched apart from
the final scale, so they contribute only to the softmax denominator.

All functions take
    logits : (B, C) cosine logits in [-1, 1], float32
    labels : (B,)   int32 target column per row, or -1 for "no target here"
and return the transformed, scale-multiplied logits.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _one_hot_valid(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot of labels with all-zero rows for label == -1."""
    # jax.nn.one_hot maps out-of-range (-1) to the zero vector already.
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def arcface(logits: jnp.ndarray, labels: jnp.ndarray, s: float = 64.0,
            m: float = 0.5, easy_margin: bool = False) -> jnp.ndarray:
    """Additive angular margin: target cosθ → cos(θ+m) (reference nets/ArcFace.py:63-91).

    Hard-margin fallback: where cosθ ≤ cos(π−m), use cosθ − sin(π−m)·m instead,
    keeping the transform monotone (reference nets/ArcFace.py:86-87).
    """
    cos_m = math.cos(m)
    sin_m = math.sin(m)
    theta = math.cos(math.pi - m)
    sinmm = math.sin(math.pi - m) * m

    onehot = _one_hot_valid(labels, logits.shape[-1])
    target = logits  # elementwise view; margin applied only at onehot positions
    # Gradient-safe sqrt: at |cosθ| == 1 (reachable after the ±1 clamp,
    # reference nets/PartialFC.py:204) sqrt'(0) is inf — mask the argument so
    # the NaN never enters the backward graph (value is identical).
    sq = 1.0 - jnp.square(target)
    sin_theta = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    cos_theta_m = target * cos_m - sin_theta * sin_m
    if easy_margin:
        margined = jnp.where(target > 0, cos_theta_m, target)
    else:
        margined = jnp.where(target > theta, cos_theta_m, target - sinmm)
    out = jnp.where(onehot > 0, margined, logits)
    return out * s


def cosface(logits: jnp.ndarray, labels: jnp.ndarray, s: float = 64.0,
            m: float = 0.4) -> jnp.ndarray:
    """Additive cosine margin: target cosθ → cosθ − m (reference nets/ArcFace.py:94-106)."""
    onehot = _one_hot_valid(labels, logits.shape[-1])
    return (logits - onehot * m) * s


def combined_margin(logits: jnp.ndarray, labels: jnp.ndarray, s: float,
                    m1: float, m2: float, m3: float,
                    interclass_filtering_threshold: float = 0.0) -> jnp.ndarray:
    """Insightface combined margin s·[cos(m1·θ + m2) − m3]
    (reference nets/ArcFace.py:5-61).

    Only the two reference-supported parameterisations are implemented:
    (m1=1, m3=0) → ArcFace form; (m3>0) → CosFace form.
    """
    onehot = _one_hot_valid(labels, logits.shape[-1])

    if interclass_filtering_threshold > 0:
        # Zero out "dirty" logits above the threshold, except the target
        # column of rows that have a target (reference nets/ArcFace.py:30-38).
        dirty = (logits > interclass_filtering_threshold).astype(logits.dtype)
        has_target = (labels >= 0)[:, None].astype(logits.dtype)
        keep_target = onehot * has_target
        dirty = dirty * (1.0 - keep_target)
        logits = (1.0 - dirty) * logits

    if m1 == 1.0 and m3 == 0.0:
        return arcface(logits, labels, s=s, m=m2)
    elif m3 > 0:
        return cosface(logits, labels, s=s, m=m3)
    raise ValueError(f"Unsupported combined margin (m1={m1}, m2={m2}, m3={m3})")


def get_margin_fn(name: str, s: float, m: float, easy_margin: bool = False):
    """Margin dispatch by conf.metric (reference model/FR_PartialFC.py uses ArcFace).

    easy_margin maps conf.easy_margin (reference configs/ms1m_arcface_122.py:180)
    to ArcFace's monotone-fallback choice (reference nets/ArcFace.py:71-85);
    CosFace has no such flag.
    """
    if name == "ArcFace":
        return partial(arcface, s=s, m=m, easy_margin=easy_margin)
    if name == "CosFace":
        return partial(cosface, s=s, m=m)
    raise ValueError(f"Unknown margin {name!r}")
