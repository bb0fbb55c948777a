"""Shared training program for the multi-host test: identical code runs
single-process (8 devices) and 2-process (4 devices each), so the losses and
final weights must match bit-for-bit-ish (same program, same global mesh
shape, same data, CPU f32)."""

import numpy as np


def run_training(data: int, model: int, process_index: int,
                 process_count: int, steps: int = 2):
    import jax

    from fr_tpu.configs.base import Config
    from fr_tpu.data.folder import ArrayTrainLoader
    from fr_tpu.heads.partial_fc import PFCConfig
    from fr_tpu.models import build_encoder
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.state import init_train_state, state_partition_specs
    from fr_tpu.train.step import make_train_step, shard_batch

    img, n_classes, global_b = 32, 64, 16
    conf = Config(network="ResNet18", emd_size=64, n_classes=n_classes,
                  metric="ArcFace", loss_s=30.0, loss_m=0.35,
                  optimizer_name="SGD", optimizer="SGD", wd=5e-4, mom=0.9,
                  mixed_precision=False, sample_rate=0.5, img_size=img)
    pfc_cfg = PFCConfig(
        num_classes=n_classes, embedding_size=conf.emd_size,
        model_size=model, sample_rate=conf.sample_rate, margin="ArcFace",
        s=30.0, m=0.35, mixed_precision=False, optimizer="SGD")

    mesh = make_mesh(data=data, model=model)
    encoder = build_encoder(conf)

    # deterministic synthetic corpus, identical in every process
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (64, img, img, 3)).astype(np.uint8)
    labels = rng.integers(0, n_classes, 64).astype(np.int32)
    loader = ArrayTrainLoader(images, labels, global_b, seed=3,
                              process_index=process_index,
                              process_count=process_count)

    # sharded init (replicated params / class-sharded head over the global
    # mesh), same recipe as FaceRecognitionTask
    from jax.sharding import NamedSharding

    def _init(k):
        return init_train_state(k, conf, encoder, pfc_cfg, img)

    abstract = jax.eval_shape(_init, jax.random.key(0))
    specs = state_partition_specs(abstract)
    out_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    state = jax.jit(_init, out_shardings=out_shardings)(jax.random.key(0))

    step = make_train_step(conf, mesh, encoder, pfc_cfg, donate=False)
    losses = []
    it = loader.epoch(0)
    for _ in range(steps):
        imgs, labs = next(it)
        xs, ys = shard_batch(mesh, (imgs.astype(np.float32) / 255.0 - 0.5)
                             / 0.5, labs)
        state, metrics = step(state, xs, ys, 0.05, jax.random.key(1))
        losses.append(float(metrics["loss"]))

    # checksum over replicated encoder params + the head shard sums (psum'd
    # via a tiny jit so it is identical across processes)
    import jax.numpy as jnp

    @jax.jit
    def _checksum(params, w):
        leaves = jax.tree.leaves(params)
        s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
        return s + jnp.sum(jnp.abs(w))

    checksum = float(_checksum(state.params, state.pfc.weight))

    # --- validation epoch over the REAL multi-process eval path -----------
    # (make_embed_step + embed_global_batch: global-batch assembly via
    # make_array_from_process_local_data, host-global embedding fetch) —
    # every rank validates and must report the identical accuracy
    # (VERDICT round-2 #5; the reference stalls all ranks but rank 0,
    # utils/trainer.py:82-94).
    from fr_tpu.eval.verification import (pair_score, performance_acc,
                                          performance_roc)
    from fr_tpu.train.step import embed_global_batch, make_embed_step

    embed = make_embed_step(conf, mesh, encoder)
    n_pairs = 24
    pairs = rng.integers(0, 256, (n_pairs, 2, img, img, 3)).astype(np.uint8)
    pair_labels = rng.integers(0, 2, n_pairs).astype(bool)
    embs = []
    for s0 in range(0, n_pairs, 8):          # 8 pairs = 16 flat rows / batch
        chunk = pairs[s0:s0 + 8]
        flat = (chunk.reshape((-1, img, img, 3)).astype(np.float32)
                / 255.0 - 0.5) / 0.5
        embs.append(embed_global_batch(mesh, embed, state.params,
                                       state.batch_stats, flat))
    emb = np.concatenate(embs)
    e1, e2 = emb[0::2], emb[1::2]
    hg, hi, scores = pair_score(e1, e2, pair_labels)
    _, eer_th = performance_roc(hg, hi, min_level=1, max_level=3)
    acc = performance_acc(scores, pair_labels, eer_th)
    return losses, checksum, acc
