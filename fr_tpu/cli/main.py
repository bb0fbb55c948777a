"""CLI entry point (reference main/main.py:26-265 flag surface).

    python -m fr_tpu.cli.main --config lfw --mode train --network ResNet50 \
        --loss PartialFC --optimizer SGD --lr 0.05 --sample_rate 1.0

Differences from the reference by design:
- no mp.spawn / NCCL rendezvous: JAX SPMD drives all local chips from one
  process (multi-host via jax.distributed.initialize, --distributed);
- test mode sets img_size correctly (the reference's test path never sets
  conf.img_size and crashes — SURVEY §2 C1 quirk, deliberately fixed);
- adds --data_dir/--synthetic so the pipeline runs without the reference's
  hardcoded /workspace dataset mount, and --resume (new capability).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser("fr_tpu")
    # reference flag surface (main/main.py:29-40)
    p.add_argument("--config", type=str, default="lfw")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--network", type=str, default=None)
    p.add_argument("--loss", type=str, default=None)
    p.add_argument("--optimizer", type=str, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--sample_rate", type=float, default=None)
    p.add_argument("--sample_block", type=int, default=1,
                   help="block-aligned negative sampling: draw groups of N "
                        "consecutive class rows instead of single rows "
                        "(TPU-native layout for multi-million-identity "
                        "heads; Pallas grouped gather + in-place update, "
                        "fr_tpu/ops/sparse_rows.py). 1 = reference-exact "
                        "per-row sampling")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--test_type", type=str, default="pair",
                   choices=["pair", "cross"])
    # fr_tpu extensions
    p.add_argument("--data_dir", type=str, default=None,
                   help="override conf.train_dataset_dir")
    p.add_argument("--packed_dir", type=str, default=None,
                   help="train from a packed corpus (tools/pack_dataset)")
    p.add_argument("--device_corpus", action="store_true",
                   help="with --packed_dir: upload the corpus to device HBM "
                        "once and gather batches on device (zero image H2D "
                        "per step; for corpora that fit in spare HBM)")
    p.add_argument("--num_epoch", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--test_b", type=int, default=None,
                   help="test-mode batch (pairs); default 1 matches the "
                        "reference's batch_size=1 test loaders so the "
                        "logged inference time is per-pair latency")
    p.add_argument("--img_size", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train/eval on synthetic identity data")
    p.add_argument("--synthetic_classes", type=int, default=128)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile", type=int, default=0,
                   help="capture a jax.profiler trace of N steps")
    p.add_argument("--save_root", type=str, default="save")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--mesh_model", type=int, default=None)
    p.add_argument("--spmd_mode", choices=["auto", "shard_map", "gspmd"],
                   default="auto",
                   help="multi-chip lowering: auto (benchmark both on the "
                        "first batch, keep the faster — see ROUND2_NOTES), "
                        "shard_map (reference-faithful local BN) or gspmd "
                        "(pjit, sync-BN)")
    return p.parse_args(argv)


def build_conf(args):
    from fr_tpu.configs import default_img_size, load_config

    conf = load_config(
        args.config, network=args.network, loss=args.loss,
        optimizer=args.optimizer, lr=args.lr, sample_rate=args.sample_rate,
        ckpt_path=args.ckpt_path)
    conf.test_type = args.test_type
    conf.spmd_mode = args.spmd_mode
    conf.sample_block = args.sample_block
    if args.test_b is not None:
        conf.test_b = args.test_b
    conf.img_size = (args.img_size if args.img_size
                     else default_img_size(conf.network))  # main/main.py:102
    conf.min_lr = conf.lr / 1000                     # main/main.py:94-101
    if args.num_epoch is not None:
        conf.num_epoch = args.num_epoch
    if args.batch is not None:
        conf.b = args.batch
    if args.data_dir is not None:
        conf.train_dataset_dir = args.data_dir
    return conf


def make_save_dir(args, conf) -> Path:
    # timestamped run dir (reference main/main.py:108-117)
    prefix = f"{conf.network}_{conf.loss}_"
    if getattr(args, "resume", False):
        # --resume must land in the PREVIOUS run's dir (orbax state lives
        # there); a fresh timestamped dir would silently restart from 0.
        # Pick the newest matching run under save_root if one exists.
        prior = sorted(Path(args.save_root).glob(f"{prefix}*"))
        if prior:
            print(f"--resume: reusing run dir {prior[-1]}")
            return prior[-1]
    stamp = time.strftime("%Y%m%d_%H%M%S")
    save = Path(args.save_root) / f"{prefix}{stamp}"
    save.mkdir(parents=True, exist_ok=True)
    logger = save / "log.txt"
    # full resolved config dump (reference main/main.py:129-136)
    with open(save / f"{args.config}_config.txt", "w") as f:
        f.write(conf.pretty())
    from fr_tpu.utils.logger import print_log
    print_log(str(logger), conf.pretty())
    return save


def _loaders(args, conf, mesh):
    import jax
    from fr_tpu.data import (ArrayPairDataset, ArrayTrainLoader,
                             ImageFolderIndex, PairDataset, TrainLoader,
                             synthetic_corpus, synthetic_pairs)
    # process-sharded loading under multi-host (the reference's
    # DistributedSampler role, utils/data_partial.py:273)
    pidx, pcnt = jax.process_index(), jax.process_count()
    if args.synthetic:
        imgs, labels = synthetic_corpus(args.synthetic_classes, 8,
                                        conf.img_size)
        conf.n_classes = args.synthetic_classes
        conf.val_dataset = ["synthetic"]
        train = ArrayTrainLoader(imgs, labels, conf.b,
                                 process_index=pidx, process_count=pcnt)
        pairs, same = synthetic_pairs(256, args.synthetic_classes,
                                      conf.img_size)
        return train, {"synthetic": ArrayPairDataset(pairs, same)}
    if args.packed_dir:
        from fr_tpu.data import PackedTrainLoader
        train = PackedTrainLoader(args.packed_dir, conf.b,
                                  process_index=pidx, process_count=pcnt)
        packed_size = train.images.shape[1]
        if packed_size != conf.img_size:
            raise ValueError(
                f"packed corpus is {packed_size}px but conf.img_size is "
                f"{conf.img_size}; repack with --img_size {conf.img_size} "
                f"or pass --img_size {packed_size}")
        conf.n_classes = train.num_classes
        if args.device_corpus:
            from fr_tpu.data.device_corpus import DeviceCorpusLoader
            assert pcnt == 1, "--device_corpus is single-process (one host)"
            train = DeviceCorpusLoader(train.images, train.labels, conf.b,
                                       mesh)
    else:
        index = ImageFolderIndex(conf.train_dataset_dir)
        conf.n_classes = index.num_classes
        train = TrainLoader(index, conf.b, conf.img_size,
                            prefetch=conf.get("num_workers", 4),
                            process_index=pidx, process_count=pcnt)
    vals = {}
    for name, d in zip(conf.val_dataset, conf.val_dataset_dir):
        try:
            vals[name] = PairDataset(d, conf.img_size)
        except FileNotFoundError as e:
            print(f"skipping val dataset {name}: {e}")
    return train, vals


def train(args):
    import jax
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.task import FaceRecognitionTask
    from fr_tpu.train.trainer import Trainer

    if args.distributed:
        jax.distributed.initialize()
    conf = build_conf(args)
    mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
    save = make_save_dir(args, conf)
    logger = str(save / "log.txt")

    train_loader, vals = _loaders(args, conf, mesh)
    task = FaceRecognitionTask(conf, logger=logger, stage="train", mesh=mesh)
    trainer = Trainer(conf, save, "train", logger)
    trainer.train(task, train_loader, vals, resume=args.resume,
                  profile_steps=args.profile)


def test(args):
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.task import FaceRecognitionTask
    from fr_tpu.train.trainer import Trainer
    from fr_tpu.data import CrossDataset, PairDataset, synthetic_pairs

    conf = build_conf(args)
    mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
    save = make_save_dir(args, conf)
    logger = str(save / "log.txt")

    tests = {}
    if args.synthetic:
        conf.n_classes = args.synthetic_classes
        conf.test_dataset = ["synthetic"]
        if conf.test_type == "pair":
            from fr_tpu.data import ArrayPairDataset
            pairs, same = synthetic_pairs(256, args.synthetic_classes,
                                          conf.img_size)
            tests["synthetic"] = ArrayPairDataset(pairs, same)
        else:  # cross: flat image list + identity labels
            from fr_tpu.data import synthetic_corpus
            imgs, labels = synthetic_corpus(args.synthetic_classes, 4,
                                            conf.img_size)
            imgs_f = (imgs.astype("float32") / 255.0 - 0.5) / 0.5

            class _C:
                def batches(self, b):
                    for s in range(0, len(labels), b):
                        yield imgs_f[s:s + b], labels[s:s + b]
            tests["synthetic"] = _C()
    else:
        for name, d in zip(conf.test_dataset, conf.test_dataset_dir):
            try:
                if conf.test_type == "pair":
                    tests[name] = PairDataset(d, conf.img_size)
                else:
                    tests[name] = CrossDataset(d, conf.img_size)
            except FileNotFoundError as e:
                print(f"skipping test dataset {name}: {e}")

    task = FaceRecognitionTask(conf, logger=logger, stage="test", mesh=mesh)
    trainer = Trainer(conf, save, "test", logger)
    trainer.test(task, tests)


def main(argv=None):
    args = parse_args(argv)
    if args.mode == "train":
        train(args)
    else:
        test(args)


if __name__ == "__main__":
    main()
