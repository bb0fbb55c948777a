"""Verification-metric parity: exact reference semantics of
utils/eval.py reproduced with vectorised jax/numpy (no numba here, so the
oracle is a literal-python reimplementation of the reference loops)."""

import math

import numpy as np
import pytest

from fr_tpu.eval.verification import (
    NUM_BINS, cross_score, pair_score, performance_acc, performance_roc,
)


def _normalized(rng, n, d=32):
    e = rng.standard_normal((n, d))
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def _ref_pair_score(e1, e2, labels):
    """Literal transcription of the reference loop semantics
    (reference utils/eval.py:68-99) as the test oracle."""
    hg = np.zeros(NUM_BINS)
    hi = np.zeros(NUM_BINS)
    scores = np.zeros(len(labels))
    for i in range(len(labels)):
        d2 = 0.0
        for k in range(e1.shape[1]):
            d2 += math.pow(e1[i, k] - e2[i, k], 2)
        score = 1 - d2 / 4.0
        idx = int((1e5 - 1.0) * score)
        if labels[i]:
            hg[idx] += 1
        else:
            hi[idx] += 1
        scores[i] = score
    return hg, hi, scores


def _ref_roc(hg, hi, min_level=3, max_level=9):
    """Literal transcription of reference utils/eval.py:7-51."""
    thresholds = np.arange(int(1e5), 0, -1)
    cum_g = 0
    cum_i = 0
    tg = int(hg.sum())
    ti = int(hi.sum())
    diff = 1
    eer_th = 1e5
    eer = None
    nlev = max_level - min_level + 1
    frr_far = [None] * nlev
    frr_far_th = [None] * nlev
    for t in thresholds:
        far = float(cum_i + hi[t]) / ti
        frr = float(tg - cum_g) / tg
        for k in range(nlev):
            level = k + min_level
            if far <= float(f"1e-{level}"):
                if frr_far[k] is None or frr < frr_far[k]:
                    frr_far[k] = frr
                    frr_far_th[k] = t
        if abs(far - frr) < diff:
            diff = abs(far - frr)
            eer = (far + frr) / 2
            eer_th = t
        cum_g += hg[t]
        cum_i += hi[t]
    return frr_far, frr_far_th, eer, eer_th


def test_pair_score_matches_reference_semantics():
    rng = np.random.default_rng(0)
    n = 400
    e1 = _normalized(rng, n)
    e2 = _normalized(rng, n)
    labels = rng.integers(0, 2, n)

    hg, hi, scores = pair_score(e1.astype(np.float32), e2.astype(np.float32), labels)
    rhg, rhi, rscores = _ref_pair_score(e1.astype(np.float32), e2.astype(np.float32), labels)

    np.testing.assert_allclose(scores, rscores, atol=1e-12)
    np.testing.assert_array_equal(hg, rhg)
    np.testing.assert_array_equal(hi, rhi)

    # the on-device f32 variant agrees up to ±1 bin at bucket boundaries
    from fr_tpu.eval.verification import pair_score_device
    dhg, dhi, dscores = pair_score_device(
        e1.astype(np.float32), e2.astype(np.float32), labels)
    assert dhg.sum() == rhg.sum() and dhi.sum() == rhi.sum()
    np.testing.assert_allclose(dscores, rscores, atol=1e-5)


def test_roc_matches_reference_semantics():
    rng = np.random.default_rng(1)
    n = 3000
    # genuine scores high, imposter low, with overlap
    genuine = np.clip(rng.normal(0.8, 0.08, n), 0, 1)
    imposter = np.clip(rng.normal(0.5, 0.1, n), 0, 1)
    hg = np.zeros(NUM_BINS)
    hi = np.zeros(NUM_BINS)
    for s in genuine:
        hg[int((1e5 - 1) * s)] += 1
    for s in imposter:
        hi[int((1e5 - 1) * s)] += 1

    msg, eer_th = performance_roc(hg, hi, min_level=1, max_level=6)
    r_frr_far, r_frr_far_th, r_eer, r_eer_th = _ref_roc(hg, hi, 1, 6)
    assert eer_th == r_eer_th
    for level, (f, t) in enumerate(zip(r_frr_far, r_frr_far_th), start=1):
        if f is not None:
            assert f"(Threshold = {t / 1e5:.5f})" in msg
            assert f"FRR @ FAR{level} {100 * f:6.3f}%" in msg
    assert f"EER {100 * r_eer:6.3f}%" in msg


def test_performance_acc():
    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels = np.array([1, 0, 1, 0])
    th = 50000  # 0.5
    # fr: score<=0.5 & label 1 → 1 (0.3) ; fa: score>0.5 & label 0 → 1 (0.8)
    acc = performance_acc(scores, labels, th)
    np.testing.assert_allclose(acc, 50.0)


def test_cross_score_matches_bruteforce():
    rng = np.random.default_rng(2)
    n = 40
    emb = _normalized(rng, n).astype(np.float32)
    labels = rng.integers(0, 5, n)

    hg, hi, scores, pair_labels = cross_score(emb, labels)

    # brute-force oracle with reference ordering (i outer, j inner)
    l = 0
    exp_scores = np.zeros(n * (n - 1) // 2)
    exp_labels = np.zeros(n * (n - 1) // 2)
    ehg = np.zeros(NUM_BINS)
    ehi = np.zeros(NUM_BINS)
    for i in range(n):
        for j in range(i):
            d2 = 0.0
            for k in range(emb.shape[1]):
                d2 += math.pow(emb[j, k] - emb[i, k], 2)
            s = 1 - d2 / 4.0
            exp_scores[l] = s
            b = int((1e5 - 1) * s)
            if labels[j] == labels[i]:
                ehg[b] += 1
                exp_labels[l] = 1
            else:
                ehi[b] += 1
            l += 1
    np.testing.assert_allclose(scores, exp_scores, atol=1e-12)
    np.testing.assert_array_equal(pair_labels, exp_labels)
    np.testing.assert_array_equal(hg, ehg)
    np.testing.assert_array_equal(hi, ehi)
