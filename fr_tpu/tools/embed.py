"""Offline embedding export: images → L2-normalised 512-d face embeddings.

The serving-side companion to training: everything the reference exposes
only implicitly inside its test path (model/FR_PartialFC.py:196-218 —
encoder forward + F.normalize over a loader) as a standalone batch tool.

    python -m fr_tpu.tools.embed --ckpt save/.../10_epoch_encoder.npz \
        --network ResNet100 --input_dir /data/faces --out /tmp/emb

Accepts fr_tpu .npz snapshots or reference torch .pth checkpoints
(fr_tpu/ckpt/checkpoint.py load_encoder handles both). `--input_dir` may be
a flat directory of images or class-per-directory layout; images are
decoded/resized on host, normalised mean .5 / std .5 exactly like the eval
datasets (reference utils/data_partial.py:53-58), and embedded with the
same jitted embed step the validation path uses (fr_tpu/train/step.py
make_embed_step). Writes `<out>.npy` (N, emd_size) float32 and
`<out>.files.txt` (one source path per row).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(input_dir: str):
    """Flat dir of images, or any directory tree (class dirs included) —
    deterministic sorted order."""
    root = Path(input_dir)
    if not root.is_dir():
        raise FileNotFoundError(input_dir)
    files = sorted(str(p) for p in root.rglob("*")
                   if p.is_file() and p.suffix.lower() in IMG_EXTENSIONS)
    if not files:
        raise FileNotFoundError(f"no images under {input_dir}")
    return files


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help=".npz encoder snapshot or reference .pth")
    p.add_argument("--network", default="ResNet100")
    p.add_argument("--config", default="ms1m_arcface_122")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--out", required=True, help="output prefix")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--img_size", type=int, default=None,
                   help="default: config img_size (112, or 192 for AlterNet)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from fr_tpu.ckpt import load_encoder
    from fr_tpu.configs import load_config
    from fr_tpu.data.folder import _decode_resize
    from fr_tpu.models import build_encoder
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.step import make_embed_step

    conf = load_config(args.config, network=args.network)
    if args.img_size:
        conf.img_size = args.img_size

    import jax

    # make_embed_step shards the batch dim over the mesh; round --batch up so
    # every compiled batch divides evenly (padding makes the extra rows free)
    n_dev = len(jax.devices())
    if args.batch % n_dev:
        args.batch = ((args.batch + n_dev - 1) // n_dev) * n_dev
        print(f"--batch rounded up to {args.batch} "
              f"(multiple of {n_dev} devices)")

    params, batch_stats, meta = load_encoder(args.ckpt, args.network)
    encoder = build_encoder(conf)
    mesh = make_mesh()
    embed = make_embed_step(conf, mesh, encoder)

    files = list_images(args.input_dir)
    out = np.empty((len(files), conf.emd_size), np.float32)
    bs = args.batch
    for s in range(0, len(files), bs):
        sel = files[s:s + bs]
        imgs = np.empty((len(sel), conf.img_size, conf.img_size, 3),
                        np.float32)
        for j, f in enumerate(sel):
            imgs[j] = (_decode_resize(f, conf.img_size).astype(np.float32)
                       / 255.0 - 0.5) / 0.5
        # pad the tail so one compiled program serves every batch
        if len(sel) < bs:
            imgs = np.concatenate(
                [imgs, np.zeros((bs - len(sel),) + imgs.shape[1:],
                                np.float32)])
        emb = np.asarray(embed(params, batch_stats, jnp.asarray(imgs)))
        out[s:s + len(sel)] = emb[:len(sel)]

    np.save(args.out + ".npy", out)
    with open(args.out + ".files.txt", "w") as fh:
        fh.write("\n".join(files) + "\n")
    print(f"embedded {len(files)} images "
          f"({meta.get('name', args.network)}, {conf.emd_size}-d) "
          f"-> {args.out}.npy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
