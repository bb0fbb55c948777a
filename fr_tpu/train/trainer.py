"""Training loop (reference utils/trainer.py:23-158 semantics).

Epoch loop with per-epoch reshuffle, periodic validation, TensorBoard
scalars, encoder snapshots every save_epoch — plus capability upgrades over
the reference: full-state orbax checkpoints with exact resume (the reference
has no resume path, SURVEY §5) and all-rank metrics (the reference validates
on rank 0 only while other ranks idle).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

from fr_tpu.utils.logger import print_log


class Trainer:
    def __init__(self, conf, save_dir, mode: str = "train", logger=None,
                 tensorboard: bool = True):
        assert mode in ("train", "test"), "Invalid Mode !!!"
        self.conf = conf
        self.save_dir = Path(save_dir)
        self.logger_ = logger
        self.writer = None
        if mode == "train" and tensorboard:
            try:  # TB logging (reference utils/trainer.py:41-47)
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(
                    str(self.save_dir / "TBLog"))
                self.writer.add_text(
                    "Config", "".join(f"{k} : {v}  \n"
                                      for k, v in conf.items()), 0)
            except Exception:
                self.writer = None

    # ------------------------------------------------------------------
    def train(self, task, train_loader, val_datasets: Optional[Dict] = None,
              resume: bool = False, profile_steps: int = 0):
        """task: FaceRecognitionTask; train_loader: TrainLoader-like with
        .epoch(e) and .steps_per_epoch(); val_datasets: {name: PairDataset}.

        profile_steps > 0 captures a jax.profiler trace of that many steps of
        the first epoch into <save_dir>/profile (capability upgrade: the
        reference has only ad-hoc CUDA-event timers, SURVEY §5)."""
        import jax
        conf = self.conf
        start_epoch = 0
        if resume:
            from fr_tpu.ckpt import latest_step, restore_train_state
            step = latest_step(str(self.save_dir))
            if step is not None:
                task.state = restore_train_state(str(self.save_dir),
                                                 task.state, step)
                start_epoch = step
                task.epoch = step
                print_log(self.logger_, f"resumed at epoch {step}")

        profiling = False
        for epoch in range(start_epoch, conf.num_epoch):
            running_t = 0.0
            train_outputs: List[Dict] = []
            print_log(self.logger_, f"{epoch + 1} Epoch Training")
            if getattr(train_loader, "device_resident", False):
                # corpus lives in HBM; batches are already device arrays
                batches = train_loader.epoch(epoch)
            else:
                batches = task.prefetch_device_batches(
                    train_loader.epoch(epoch))
            for step_i, batch in enumerate(batches):
                if profile_steps and epoch == start_epoch:
                    if step_i == 1:  # skip compile step
                        jax.profiler.start_trace(str(self.save_dir / "profile"))
                        profiling = True
                    elif profiling and step_i == 1 + profile_steps:
                        jax.profiler.stop_trace()
                        profiling = False
                        print_log(self.logger_,
                                  f"profile trace: {self.save_dir}/profile")
                t0 = time.time()
                train_outputs.append(task.training_step(batch))
                running_t += time.time() - t0
            # steps dispatch asynchronously (the torch reference syncs every
            # step by pulling loss to numpy, model/FR_PartialFC.py:190-192);
            # fetch the final loss inside the timed region so the epoch time
            # and imgs/sec are honest without serialising the pipeline.
            if train_outputs:
                import numpy as _np
                t0 = time.time()
                float(_np.asarray(train_outputs[-1]["loss"]))
                running_t += time.time() - t0
            if profiling:
                jax.profiler.stop_trace()
                profiling = False

            if (epoch + 1) % conf.valid_freq == 0 and val_datasets:
                print_log(self.logger_, f"{epoch + 1} Epoch Validation")
                for v_idx, (name, ds) in enumerate(val_datasets.items()):
                    val_outputs = [task.validation_step(b, v_idx)
                                   for b in ds.batches(conf.b)]
                    task.validation_epoch_end(val_outputs)

            results = task.training_epoch_end(train_outputs, running_t)

            if self.writer is not None:
                ds = conf.train_dataset
                self.writer.add_scalar(f"{ds}/Learning Rate",
                                       results["lr"], epoch)
                self.writer.add_scalar(f"{ds}/Train Loss",
                                       results["train_loss"], epoch)
                if results["val_acc"]:
                    for name, acc in results["val_acc"].items():
                        self.writer.add_scalar(
                            f"{ds}/{name} Validation ACC", acc, epoch)

            if (epoch + 1) % conf.save_epoch == 0:
                # Encoder snapshot (reference utils/trainer.py:107-115) +
                # full resumable state (capability upgrade).
                from fr_tpu.ckpt import export_encoder, save_train_state
                import jax
                import numpy as np
                params = jax.tree.map(np.asarray, task.state.params)
                stats = jax.tree.map(np.asarray, task.state.batch_stats)
                export_encoder(
                    str(self.save_dir / f"{epoch + 1}_epoch_encoder.npz"),
                    params, stats, epoch + 1, conf.network)
                save_train_state(str(self.save_dir), task.state, epoch + 1)
        return task

    # ------------------------------------------------------------------
    def test(self, task, test_datasets: Dict):
        """Pair or cross test over each dataset
        (reference utils/trainer.py:118-158)."""
        conf = self.conf
        # reference test loaders use batch_size=1 with per-batch timing
        # (utils/data_partial.py:288-294), so the logged "Test Inference
        # Time" is per-pair latency; conf.test_b keeps that comparable
        # (default 1) while allowing throughput-mode testing (test_b=conf.b)
        test_b = int(conf.get("test_b", 1) or 1)
        for t_idx, (name, ds) in enumerate(test_datasets.items()):
            print_log(self.logger_, f"{t_idx + 1}th Test Dataset")
            if conf.get("test_type", "pair") == "pair":
                outs = [task.test_step(b, t_idx) for b in ds.batches(test_b)]
                task.test_epoch_end(outs)
            else:
                outs = [task.cross_test_step(b, t_idx)
                        for b in ds.batches(test_b)]
                task.cross_test_epoch_end(outs)

        msg = "=" * 50
        for name, tm in task.test_msg.items():
            msg += "\n".join([
                f'\n\n[Test with "{name}"]',
                f"- Test Accuracy: {tm.acc:.2f}%",
                f"- Test Inference Time: {tm.infer_time:.2f}ms\n"])
            msg += tm.roc
        msg += "=" * 50 + "\n"
        print_log(self.logger_, msg)
        return task.test_msg
