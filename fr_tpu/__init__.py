"""fr_tpu — a TPU-native face-recognition training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``aanna0701/face-recognition-pytorch`` (reference mounted at /root/reference):

- IR-ResNet / SwinV2 / AlterNet-hybrid / EffiAlterNet face-embedding encoders
  (reference: nets/*.py) as functional flax modules, bf16-on-MXU by default.
- Margin softmax (ArcFace / CosFace / CombinedMargin; reference nets/ArcFace.py)
  and a GSPMD/shard_map class-sharded PartialFC head with negative sampling
  (reference nets/PartialFC.py) built on jax.sharding meshes and XLA
  collectives instead of NCCL.
- Pair/cross verification metrics with the reference's exact 100001-bin
  histogram ROC semantics (reference utils/eval.py), fully vectorised.
- pjit/shard_map train step, optax-style optimizers with sampled-row state
  updates, cosine-warmup-restart schedule (reference utils/scheduler.py).
"""

__version__ = "0.1.0"
