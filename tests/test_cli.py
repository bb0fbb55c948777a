"""End-to-end CLI: train on a synthetic folder dataset, then test mode
(reference main/main.py train/test flows)."""

import os
import re

import numpy as np
import pytest

from fr_tpu.cli.main import main as cli_main
from fr_tpu.data.synthetic import write_synthetic_folder


def test_cli_train_synthetic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli_main([
        "--config", "lfw", "--mode", "train", "--network", "ResNet18",
        "--synthetic", "--synthetic_classes", "8", "--img_size", "16",
        "--batch", "8", "--num_epoch", "6", "--save_root", str(tmp_path / "save"),
    ])
    runs = list((tmp_path / "save").iterdir())
    assert len(runs) == 1
    run = runs[0]
    log = (run / "log.txt").read_text()
    assert "[Training with" in log
    assert "Train Loss" in log
    assert "[Validation with" in log  # lfw config: valid_freq 1
    assert "- EER" in log
    # config dump sidecar (reference main/main.py:129-136)
    assert (run / "lfw_config.txt").exists()
    # encoder export at save_epoch? lfw save_epoch=10 > 2 epochs → none; the
    # full-state dir only appears on save. Train loss must be finite:
    losses = [float(m) for m in re.findall(r"Train Loss: ([\d.]+)", log)]
    assert len(losses) == 6 and all(np.isfinite(losses))


def test_cli_resume_reuses_run_dir(tmp_path, monkeypatch):
    """--resume must land in the PREVIOUS timestamped run dir (where the
    orbax state lives) and continue from its checkpoint instead of silently
    restarting a fresh run at epoch 0."""
    monkeypatch.chdir(tmp_path)
    args = [
        "--config", "lfw", "--mode", "train", "--network", "ResNet18",
        "--synthetic", "--synthetic_classes", "8", "--img_size", "16",
        "--batch", "8", "--save_root", str(tmp_path / "save"),
    ]
    # lfw save_epoch=10 → full-state checkpoint at epoch 10 of 12
    cli_main(args + ["--num_epoch", "12"])
    runs = list((tmp_path / "save").iterdir())
    assert len(runs) == 1 and (runs[0] / "state").exists()

    cli_main(args + ["--num_epoch", "14", "--resume"])
    runs = list((tmp_path / "save").iterdir())
    assert len(runs) == 1, "resume must not create a second run dir"
    log = (runs[0] / "log.txt").read_text()
    assert "resumed at epoch 10" in log
    # epochs 11-14 trained after resume; loss stays finite
    losses = [float(m) for m in re.findall(r"Train Loss: ([\d.]+)", log)]
    assert len(losses) == 12 + 4 and all(np.isfinite(losses))


def test_cli_train_folder_and_checkpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = tmp_path / "data"
    write_synthetic_folder(str(data), n_classes=6, per_class=4, img_size=16)
    cli_main([
        "--config", "lfw", "--mode", "train", "--network", "ResNet18",
        "--data_dir", str(data), "--img_size", "16", "--batch", "8",
        "--num_epoch", "6", "--save_root", str(tmp_path / "save"),
    ])
    run = list((tmp_path / "save").iterdir())[0]
    log = (run / "log.txt").read_text()
    assert "Epoch 1/6" in log


def test_cli_cross_test_mode_synthetic(tmp_path, monkeypatch):
    """N(N−1)/2 cross matching (reference utils/trainer.py:136-142)."""
    monkeypatch.chdir(tmp_path)
    cli_main([
        "--config", "lfw", "--mode", "test", "--network", "ResNet18",
        "--test_type", "cross", "--synthetic", "--synthetic_classes", "6",
        "--img_size", "16", "--batch", "12",
        "--save_root", str(tmp_path / "save"),
    ])
    run = list((tmp_path / "save").iterdir())[0]
    log = (run / "log.txt").read_text()
    assert '[Test with "synthetic"]' in log
    # 24 images → 276 cross pairs
    assert "Total count = 276" in log


def test_cli_test_mode_synthetic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli_main([
        "--config", "lfw", "--mode", "test", "--network", "ResNet18",
        "--synthetic", "--synthetic_classes", "8", "--img_size", "16",
        "--batch", "16", "--save_root", str(tmp_path / "save"),
    ])
    run = list((tmp_path / "save").iterdir())[0]
    log = (run / "log.txt").read_text()
    assert '[Test with "synthetic"]' in log
    assert "Test Accuracy" in log
    assert "FRR @ FAR" in log
