"""Native C++ scoring kernels vs the numpy implementations (bit-exactness)."""

import numpy as np
import pytest

from fr_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.load()


def test_pair_score_native_matches_numpy(lib):
    rng = np.random.default_rng(0)
    n, d = 500, 64
    e1 = rng.standard_normal((n, d)).astype(np.float32)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = rng.standard_normal((n, d)).astype(np.float32)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    labels = rng.integers(0, 2, n)

    hg_n, hi_n, sc_n = native.pair_score_native(e1, e2, labels)
    diff = (e1 - e2).astype(np.float64)
    sc = 1.0 - np.sum(np.square(diff), axis=-1) / 4.0
    # sequential (numba-faithful) vs numpy-pairwise summation: 1-ulp noise
    np.testing.assert_allclose(sc_n, sc, atol=1e-12)
    # histograms must be exactly consistent with the native scores
    idx = np.clip(((1e5 - 1.0) * sc_n).astype(np.int64), 0,
                  native.NUM_BINS - 1)
    hg = np.bincount(idx[labels.astype(bool)], minlength=native.NUM_BINS)
    hi = np.bincount(idx[~labels.astype(bool)], minlength=native.NUM_BINS)
    np.testing.assert_array_equal(hg_n, hg)
    np.testing.assert_array_equal(hi_n, hi)


def test_cross_score_native_matches_numpy(lib):
    rng = np.random.default_rng(1)
    n, d = 60, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = rng.integers(0, 7, n).astype(np.int64)

    hg_n, hi_n, sc_n, pl_n = native.cross_score_native(emb, labels)

    # brute-force reference order
    l = 0
    total = n * (n - 1) // 2
    sc = np.zeros(total)
    pl = np.zeros(total)
    for i in range(n):
        for j in range(i):
            dvec = (emb[j] - emb[i]).astype(np.float64)
            sc[l] = 1.0 - float(np.dot(dvec, dvec)) / 4.0
            pl[l] = 1.0 if labels[i] == labels[j] else 0.0
            l += 1
    np.testing.assert_allclose(sc_n, sc, atol=1e-15)
    np.testing.assert_array_equal(pl_n, pl)
    assert hg_n.sum() == pl.sum()
    assert hi_n.sum() == total - pl.sum()


def test_gather_u8(lib):
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (20, 8, 8, 3)).astype(np.uint8)
    idx = rng.integers(0, 20, 12)
    out = native.gather_u8_native(imgs, idx)
    np.testing.assert_array_equal(out, imgs[idx])


def test_eval_dispatch_uses_native(lib):
    """pair_score with f32 inputs must round-trip through the native path and
    agree with the f64 numpy path bin-for-bin."""
    import os
    from fr_tpu.eval.verification import pair_score
    rng = np.random.default_rng(3)
    e1 = rng.standard_normal((200, 16)).astype(np.float32)
    e2 = rng.standard_normal((200, 16)).astype(np.float32)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    labels = rng.integers(0, 2, 200)
    hg1, hi1, sc1 = pair_score(e1, e2, labels)
    # force numpy fallback via f64 inputs
    hg2, hi2, sc2 = pair_score(e1.astype(np.float64), e2.astype(np.float64),
                               labels)
    # the f64-input fallback computes exact f64 diffs; the native f32 path
    # rounds diffs to f32 first (numba-faithful) — ~1e-7 score differences
    np.testing.assert_allclose(sc1, sc2, atol=1e-5)
    assert hg1.sum() == hg2.sum() and hi1.sum() == hi2.sum()
    assert np.abs(hg1 - hg2).sum() <= 4 and np.abs(hi1 - hi2).sum() <= 4


def test_native_jpeg_decode_matches_cv2():
    """Threaded libjpeg decode pool (fr_native.cpp decode_jpegs_rgb) vs the
    cv2 fallback path: decoded pixels within JPEG-decoder tolerance (IFAST
    DCT vs cv2's decoder: a few LSB) and correct shapes, including resize."""
    import cv2
    from fr_tpu import native

    if not native.jpeg_available():
        import pytest
        pytest.skip("native jpeg pool unavailable")

    rng = np.random.default_rng(0)
    blobs = []
    refs = []
    for i in range(12):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 3)
        ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                               [cv2.IMWRITE_JPEG_QUALITY, 92])
        assert ok
        blobs.append(enc.tobytes())
        dec = cv2.cvtColor(cv2.imdecode(np.frombuffer(blobs[-1], np.uint8),
                                        cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        refs.append(cv2.resize(dec, (64, 64),
                               interpolation=cv2.INTER_LINEAR))

    out = native.decode_jpegs_native(blobs, 64)
    assert out is not None and out.shape == (12, 64, 64, 3)
    for got, ref in zip(out, refs):
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.mean() < 3.0 and np.percentile(diff, 99) <= 12, (
            diff.mean(), diff.max())


def test_native_jpeg_decode_rejects_garbage():
    from fr_tpu import native

    if not native.jpeg_available():
        import pytest
        pytest.skip("native jpeg pool unavailable")
    out = native.decode_jpegs_native([b"not a jpeg", b"\xff\xd8\xff garbage"],
                                     32)
    assert out is None  # caller falls back to cv2
