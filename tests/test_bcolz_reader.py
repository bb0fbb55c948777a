"""bcolz-less validation-set ingest (VERDICT round-2 missing #3 / next #6):
first-party bcolz rootdir reader over the system C-Blosc library, the
convert_bcolz tool, and PairDataset's direct-rootdir fallback.

Fixtures are genuine blosc chunks (compressed through libblosc itself with
bcolz's default codec settings), laid out in the bcolz 1.x rootdir schema —
the same bytes bcolz would write for these arrays."""

import json
from pathlib import Path

import numpy as np
import pytest

from fr_tpu.data.bcolz_reader import (blosc_available, compress_chunk,
                                      decompress_chunk, read_carray)

pytestmark = pytest.mark.skipif(not blosc_available(),
                                reason="libblosc not present")


def _write_rootdir(root: Path, arr: np.ndarray, chunklen: int,
                   cname: str) -> None:
    """bcolz 1.x persistent-carray layout: meta/{sizes,storage} JSON +
    data/__{i}.blp blosc chunks of `chunklen` leading-axis items."""
    (root / "meta").mkdir(parents=True)
    (root / "data").mkdir()
    atom = arr.dtype if arr.ndim == 1 else np.dtype(
        (arr.dtype, arr.shape[1:]))
    (root / "meta" / "sizes").write_text(json.dumps(
        {"shape": [int(s) for s in arr.shape], "nbytes": int(arr.nbytes),
         "cbytes": 0}))
    (root / "meta" / "storage").write_text(json.dumps(
        {"dtype": str(atom), "cparams": {"clevel": 5, "shuffle": 1,
                                         "cname": cname},
         "chunklen": chunklen, "dflt": 0.0,
         "expectedlen": int(arr.shape[0])}))
    flat = np.ascontiguousarray(arr)
    for i, s in enumerate(range(0, arr.shape[0], chunklen)):
        part = flat[s:s + chunklen].tobytes()
        (root / "data" / f"__{i}.blp").write_bytes(
            compress_chunk(part, arr.dtype.itemsize, cname=cname))


def test_blosc_chunk_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.standard_normal(4096).astype(np.float32).tobytes()
    for cname in ("blosclz", "lz4", "zlib", "zstd"):
        comp = compress_chunk(data, 4, cname=cname)
        assert decompress_chunk(comp) == data


@pytest.mark.parametrize("cname", ["blosclz", "lz4"])
def test_read_carray_multichunk_with_partial_tail(tmp_path, cname):
    rng = np.random.default_rng(1)
    # 10 items of (3, 8, 8) with chunklen 4 → chunks of 4, 4, 2 items
    arr = rng.standard_normal((10, 3, 8, 8)).astype(np.float32)
    root = tmp_path / "lfw"
    _write_rootdir(root, arr, chunklen=4, cname=cname)
    got = read_carray(str(root))
    assert got.shape == arr.shape and got.dtype == arr.dtype
    np.testing.assert_array_equal(got, arr)


def test_convert_bcolz_tool_and_pair_dataset(tmp_path):
    from fr_tpu.data.pairs import PairDataset
    from fr_tpu.tools.convert_bcolz import main as convert_main

    rng = np.random.default_rng(2)
    n_pairs, img = 6, 8
    arr = rng.standard_normal((2 * n_pairs, 3, img, img)).astype(np.float32)
    labels = rng.integers(0, 2, n_pairs).astype(bool)
    src = tmp_path / "agedb_30"
    _write_rootdir(src, arr, chunklen=5, cname="blosclz")
    np.save(str(src) + "_list.npy", labels)

    dst = tmp_path / "out" / "agedb_30"
    assert convert_main(["--src", str(src), "--dst", str(dst)]) == 0
    np.testing.assert_array_equal(np.load(str(dst) + ".npy"), arr)
    np.testing.assert_array_equal(np.load(str(dst) + "_list.npy"), labels)

    # PairDataset over the CONVERTED npy layout
    ds_npy = PairDataset(str(dst), img_size=img, shuffle_seed=None)
    # PairDataset DIRECTLY over the bcolz rootdir (bcolz-less fallback)
    ds_raw = PairDataset(str(src), img_size=img, shuffle_seed=None)
    np.testing.assert_array_equal(ds_npy.pairs, ds_raw.pairs)
    np.testing.assert_array_equal(ds_npy.labels, ds_raw.labels)
    expect = np.transpose(arr.reshape(n_pairs, 2, 3, img, img),
                          (0, 1, 3, 4, 2))
    np.testing.assert_array_equal(ds_raw.pairs, expect)
