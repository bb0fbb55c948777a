"""Pair / cross verification metrics.

Reimplements the reference's numba kernels (reference utils/eval.py:7-144)
with exact semantics but vectorised:

- score = 1 − ‖e1 − e2‖² / 4 on L2-normalised embeddings (∈ [0, 1], equals
  (1 + cosθ)/2; reference utils/eval.py:85-97).
- histogram bin = int((1e5 − 1) · score) into 100001-bin genuine/imposter
  histograms (reference utils/eval.py:90).
- ROC sweep walks thresholds 1e5 → 1; FAR(t) = Σ_{bin ≥ t} imposter / total,
  FRR(t) = Σ_{bin ≤ t} genuine / total; FRR@FAR≤1e-k keeps the *first* (i.e.
  highest-threshold) strict minimum; EER threshold likewise (reference
  utils/eval.py:25-41).
- accuracy at EER threshold: 1 − (FA + FR)/N with FR: score ≤ th/1e5 ∧ label=1,
  FA: score > th/1e5 ∧ label=0 (reference utils/eval.py:54-66).

The hot scoring paths run on-device via jax (jit-compiled, fused); the ROC
sweep is a cumsum over the fixed 100001-bin histograms on host numpy. A C++
native implementation is provided in fr_tpu/native for CPU-bound pipelines.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_BINS = 100001
_BIN_SCALE = 1e5 - 1.0


@partial(jax.jit, static_argnames=("metric",))
def _pair_score_device(embedding_1: jnp.ndarray, embedding_2: jnp.ndarray,
                       labels: jnp.ndarray, metric: str = "euclidean"):
    assert metric in ("euclidean", "cosine"), "Invalid metric !!!"
    e1 = embedding_1.astype(jnp.float32)
    e2 = embedding_2.astype(jnp.float32)
    sum_diff = jnp.sum(jnp.square(e1 - e2), axis=-1)
    score = 1.0 - sum_diff / 4.0
    hist_idx = jnp.clip((_BIN_SCALE * score).astype(jnp.int32), 0, NUM_BINS - 1)
    is_genuine = labels.astype(bool)
    hist_genuine = jnp.zeros(NUM_BINS, jnp.float32).at[hist_idx].add(
        is_genuine.astype(jnp.float32))
    hist_imposter = jnp.zeros(NUM_BINS, jnp.float32).at[hist_idx].add(
        (~is_genuine).astype(jnp.float32))
    return hist_genuine, hist_imposter, score


def pair_score(embedding_1, embedding_2, labels, metric: str = "euclidean",
               min_level: int = 3, max_level: int = 9
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pairwise verification scores + histograms (reference utils/eval.py:68-99).

    Computed in float64 on host (vectorised numpy) for bin-exact parity with
    the reference's numba kernel, which accumulates per-element math.pow in
    f64 (reference utils/eval.py:85-90). `pair_score_device` is the on-device
    f32 variant (bins can differ by ±1 at bucket boundaries).
    """
    assert metric in ("euclidean", "cosine"), "Invalid metric !!!"
    e1 = np.asarray(embedding_1)
    e2 = np.asarray(embedding_2)
    labels = np.asarray(labels)
    if e1.dtype == np.float32:
        from fr_tpu import native
        res = native.pair_score_native(e1, e2, labels)
        if res is not None:
            return res
    # numba computes the diff in the input dtype and squares/accumulates in
    # f64 (math.pow promotes); reproduce that exactly.
    diff = (e1 - e2).astype(np.float64)
    score = 1.0 - np.sum(np.square(diff), axis=-1) / 4.0
    hist_idx = np.clip((_BIN_SCALE * score).astype(np.int64), 0, NUM_BINS - 1)
    genuine = labels.astype(bool)
    hg = np.bincount(hist_idx[genuine], minlength=NUM_BINS).astype(np.float64)
    hi = np.bincount(hist_idx[~genuine], minlength=NUM_BINS).astype(np.float64)
    return hg, hi, score


def pair_score_device(embedding_1, embedding_2, labels,
                      metric: str = "euclidean"):
    """On-device (jit) pair scoring for large-scale eval loops."""
    hg, hi, score = _pair_score_device(jnp.asarray(embedding_1),
                                       jnp.asarray(embedding_2),
                                       jnp.asarray(labels), metric=metric)
    return (np.asarray(hg, np.float64), np.asarray(hi, np.float64),
            np.asarray(score, np.float64))


@partial(jax.jit, static_argnames=("metric", "block"))
def _cross_score_device(embeddings: jnp.ndarray, labels: jnp.ndarray,
                        metric: str = "euclidean", block: int = 512):
    """All-pairs (i>j) scoring, blocked over rows to bound memory.

    Returns histograms only; the reference's flattened score/label lists for
    N(N−1)/2 pairs are assembled on the host by `cross_score` (they are needed
    for the accuracy-at-EER computation, reference utils/eval.py:109-135).
    """
    assert metric in ("euclidean", "cosine"), "Invalid metric !!!"
    emb = embeddings.astype(jnp.float32)
    n = emb.shape[0]
    sq = jnp.sum(jnp.square(emb), axis=-1)

    n_pad = ((n + block - 1) // block) * block
    emb_p = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    sq_p = jnp.pad(sq, (0, n_pad - n))
    lab_p = jnp.pad(labels, (0, n_pad - n), constant_values=-1)

    def body(carry, i0):
        hg, hi = carry
        rows = jax.lax.dynamic_slice_in_dim(emb_p, i0 * block, block)
        rsq = jax.lax.dynamic_slice_in_dim(sq_p, i0 * block, block)
        rlab = jax.lax.dynamic_slice_in_dim(lab_p, i0 * block, block)
        d2 = rsq[:, None] + sq_p[None, :] - 2.0 * (rows @ emb_p.T)
        score = 1.0 - d2 / 4.0
        idx = jnp.clip((_BIN_SCALE * score).astype(jnp.int32), 0, NUM_BINS - 1)
        ii = i0 * block + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        valid = (jj < ii) & (ii < n)
        genuine = (rlab[:, None] == lab_p[None, :]) & valid
        imposter = (~(rlab[:, None] == lab_p[None, :])) & valid
        hg = hg.at[idx.ravel()].add(genuine.astype(jnp.float32).ravel())
        hi = hi.at[idx.ravel()].add(imposter.astype(jnp.float32).ravel())
        return (hg, hi), None

    init = (jnp.zeros(NUM_BINS, jnp.float32), jnp.zeros(NUM_BINS, jnp.float32))
    (hg, hi), _ = jax.lax.scan(body, init, jnp.arange(n_pad // block))
    return hg, hi


def cross_score(embeddings, labels, metric: str = "euclidean"):
    """All-pairs verification (reference utils/eval.py:102-137).

    Returns (hist_genuine, hist_imposter, score_list, label_list) with the
    reference's pair ordering: for i in range(N): for j in range(i).
    Scores in f64 on host for bin-exact parity; `_cross_score_device` is the
    blocked on-device variant for histogram-only workloads.
    """
    assert metric in ("euclidean", "cosine"), "Invalid metric !!!"
    emb = np.asarray(embeddings)
    lab = np.asarray(labels)
    if emb.dtype == np.float32 and np.issubdtype(lab.dtype, np.integer):
        from fr_tpu import native
        res = native.cross_score_native(emb, lab)
        if res is not None:
            return res
    n = emb.shape[0]
    iu_j, iu_i = np.triu_indices(n, k=1)  # j < i pairs; (i outer, j inner) order
    order = np.lexsort((iu_j, iu_i))
    jj, ii = iu_j[order], iu_i[order]
    score_list = np.empty(len(jj), np.float64)
    label_list = np.empty(len(jj), np.float64)
    hg = np.zeros(NUM_BINS, np.float64)
    hi = np.zeros(NUM_BINS, np.float64)
    block = 1 << 20
    for s in range(0, len(jj), block):
        e = slice(s, min(s + block, len(jj)))
        d2 = np.sum(np.square((emb[jj[e]] - emb[ii[e]]).astype(np.float64)),
                    axis=-1)
        sc = 1.0 - d2 / 4.0
        match = (lab[jj[e]] == lab[ii[e]])
        score_list[e] = sc
        label_list[e] = match.astype(np.float64)
        bins = np.clip((_BIN_SCALE * sc).astype(np.int64), 0, NUM_BINS - 1)
        hg += np.bincount(bins[match], minlength=NUM_BINS)
        hi += np.bincount(bins[~match], minlength=NUM_BINS)
    return hg, hi, score_list, label_list


def performance_roc(hist_genuine: np.ndarray, hist_imposter: np.ndarray,
                    min_level: int = 3, max_level: int = 9
                    ) -> Tuple[str, int]:
    """Threshold sweep over the histograms (reference utils/eval.py:7-51).

    Vectorised over the reference's descending-threshold loop with identical
    tie-breaking: strict `<` improvements keep the highest threshold.
    """
    hist_genuine = np.asarray(hist_genuine, np.float64)
    hist_imposter = np.asarray(hist_imposter, np.float64)
    total_genuine = int(hist_genuine.sum())
    total_imposter = int(hist_imposter.sum())

    # thresholds t = 100000 .. 1 (descending), matching the loop order.
    t = np.arange(int(1e5), 0, -1)
    # FAR(t) = sum of imposter bins >= t ; FRR(t) = sum of genuine bins <= t.
    cum_imp_from_top = np.cumsum(hist_imposter[::-1])[::-1]  # sum over bins >= b
    cum_gen_to_bin = np.cumsum(hist_genuine)                 # sum over bins <= b
    far = cum_imp_from_top[t] / total_imposter
    frr = cum_gen_to_bin[t] / total_genuine

    levels = list(range(min_level, max_level + 1))
    frr_far: List[Optional[float]] = [None] * len(levels)
    frr_far_th: List[Optional[int]] = [None] * len(levels)
    for k, level in enumerate(levels):
        ok = far <= float(f"1e-{level}")
        if ok.any():
            frr_ok = np.where(ok, frr, np.inf)
            best = int(np.argmin(frr_ok))  # first occurrence = highest threshold
            frr_far[k] = float(frr[best])
            frr_far_th[k] = int(t[best])

    diff = np.abs(far - frr)
    best = int(np.argmin(diff))  # first min in descending-threshold order
    eer = float((far[best] + frr[best]) / 2)
    eer_threshold = int(t[best])

    roc_result = "\n"
    for k, level in enumerate(levels):
        if frr_far[k] is None:
            roc_result += f"- FRR @ FAR{level} n/a\n"
        else:
            roc_result += (f"- FRR @ FAR{level} {100 * frr_far[k]:6.3f}%, "
                           f"(Threshold = {frr_far_th[k] / 1e5:.5f})  \n")
    roc_result += "- EER {0:6.3f}%, (Threshold = {1:.5f})\n".format(
        100 * eer, eer_threshold / 1e5)
    roc_result += "- Total count = {:,}\n".format(total_genuine + total_imposter)
    roc_result += "- Total genuine count = {:,}\n".format(total_genuine)
    roc_result += "- Total imposter count = {:,}\n".format(total_imposter)
    return roc_result, eer_threshold


def performance_acc(score_list: np.ndarray, label_list: np.ndarray,
                    th: int) -> float:
    """Accuracy at the EER threshold (reference utils/eval.py:54-66)."""
    score = np.asarray(score_list, np.float64)
    label = np.asarray(label_list)
    fr = int(np.sum((score <= th / 1e5) & (label == 1)))
    fa = int(np.sum((score > th / 1e5) & (label == 0)))
    return (1 - (fa + fr) / len(score)) * 100
