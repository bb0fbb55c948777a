"""Packed corpus: pack → load → batch equivalence with the folder loader."""

import numpy as np

from fr_tpu.data.packed import PackedTrainLoader, pack_image_folder
from fr_tpu.data.synthetic import write_synthetic_folder


def test_pack_and_load_roundtrip(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "packed"
    write_synthetic_folder(str(src), n_classes=4, per_class=3, img_size=16)
    n = pack_image_folder(str(src), str(dst), img_size=16, log_every=0)
    assert n == 12

    loader = PackedTrainLoader(str(dst), batch_size=4, seed=0)
    assert loader.num_classes == 4
    assert loader.steps_per_epoch() == 3

    seen_labels = []
    for imgs, labels in loader.epoch(0):
        assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8
        assert labels.dtype == np.int32
        seen_labels.append(labels)
    all_labels = np.sort(np.concatenate(seen_labels))
    np.testing.assert_array_equal(all_labels, np.sort(loader.labels))

    # epoch reshuffle
    b0 = np.concatenate([l for _, l in loader.epoch(0)])
    b0_again = np.concatenate([l for _, l in loader.epoch(0)])
    b1 = np.concatenate([l for _, l in loader.epoch(1)])
    np.testing.assert_array_equal(b0, b0_again)  # deterministic per epoch
    assert not np.array_equal(b0, b1)

    # images match labels: every image equals the folder image of its label
    from fr_tpu.data.folder import ImageFolderIndex, _decode_resize
    index = ImageFolderIndex(str(src))
    packed_images = np.load(str(dst / "images.npy"), mmap_mode="r")
    for i, (path, lab) in enumerate(index.samples):
        np.testing.assert_array_equal(packed_images[i],
                                      _decode_resize(path, 16))
        assert loader.labels[i] == lab


def test_cli_packed_training(tmp_path, monkeypatch):
    from fr_tpu.cli.main import main as cli_main
    monkeypatch.chdir(tmp_path)
    src = tmp_path / "src"
    write_synthetic_folder(str(src), n_classes=6, per_class=4, img_size=16)
    pack_image_folder(str(src), str(tmp_path / "packed"), img_size=16,
                      log_every=0)
    cli_main([
        "--config", "lfw", "--mode", "train", "--network", "ResNet18",
        "--packed_dir", str(tmp_path / "packed"), "--img_size", "16",
        "--batch", "8", "--num_epoch", "6",
        "--save_root", str(tmp_path / "save"),
    ])
    run = list((tmp_path / "save").iterdir())[0]
    log = (run / "log.txt").read_text()
    assert "Epoch 6/6" in log
