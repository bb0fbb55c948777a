"""End-to-end test of the embedding-export tool (fr_tpu/tools/embed.py)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_embed_tool_roundtrip(tmp_path):
    import jax

    from fr_tpu.ckpt.checkpoint import export_encoder
    from fr_tpu.configs import load_config
    from fr_tpu.models import build_encoder
    from fr_tpu.tools.embed import main

    conf = load_config("lfw", network="ResNet18")
    conf.img_size = 32
    encoder = build_encoder(conf)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = encoder.init(jax.random.key(0), x, train=False)
    ckpt = tmp_path / "enc.npz"
    export_encoder(str(ckpt), variables["params"],
                   variables.get("batch_stats", {}), 1, "ResNet18")

    # 5 images across 2 "class" dirs; image 0 and 4 identical
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    paths = []
    for i in range(5):
        d = tmp_path / "faces" / f"id_{i % 2}"
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"im{i}.png"
        cv2.imwrite(str(p), imgs[i % 4][..., ::-1])  # BGR on disk
        paths.append(str(p))

    out = tmp_path / "emb"
    rc = main(["--ckpt", str(ckpt), "--network", "ResNet18",
               "--config", "lfw", "--input_dir", str(tmp_path / "faces"),
               "--out", str(out), "--batch", "3", "--img_size", "32"])
    assert rc == 0

    emb = np.load(str(out) + ".npy")
    files = (out.parent / "emb.files.txt").read_text().splitlines()
    assert emb.shape == (5, conf.emd_size)
    assert len(files) == 5
    # embeddings are L2-normalised
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # identical source images -> identical embeddings (mod file order);
    # rows follow the sorted file list, so find the two duplicates by name
    by_name = {f.split("/")[-2] + "/" + f.split("/")[-1]: i
               for i, f in enumerate(files)}
    i0, i4 = by_name["id_0/im0.png"], by_name["id_0/im4.png"]
    np.testing.assert_allclose(emb[i0], emb[i4], atol=1e-6)
    # and distinct images differ
    assert not np.allclose(emb[i0], emb[by_name["id_1/im1.png"]])
