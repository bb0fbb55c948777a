"""The training step: one compiled SPMD program over the ('data','model') mesh.

  encoder fwd (local batch, local BN)                 — per device
  L2-normalise embeddings                             — per device
  all_gather embeddings over 'model'                  — ICI collective
  cosine logits vs sampled local class shard (bf16)   — MXU
  margin + distributed online-softmax CE              — pmax/psum over 'model'
  backward (AD derives psum_scatter for the gather)   — ICI collective
  global-norm clip 5 → SGD-mom / AdamW                — replicated
  head-row grads → sampled-row gather/update/scatter  — local

This reproduces the reference's per-step collective pattern —
2×all_gather + 3×all_reduce + reduce-to-owner + DDP bucket all-reduce
(reference SURVEY §3.4; nets/PartialFC.py:175-207,441-525;
model/FR_PartialFC.py:162-193) — with XLA collectives over ICI, and keeps
BatchNorm statistics local per device exactly like the reference's
DDP(broadcast_buffers=False) (reference model/FR_PartialFC.py:98).

Two lowering modes sharing one implementation (`_device_step`):
- mesh size 1 → plain jit. shard_map's manual-sharding lowering measured
  ~60× slower than jit for the identical program on a (1,1) mesh (XLA TPU
  loses key fusions in manual mode), so the single-chip path never touches
  shard_map.
- mesh size > 1 → shard_map with explicit collectives; vma-aware AD
  auto-psums input cotangents over every mesh axis an input is replicated
  on, so per-device grads are already the true global gradients.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fr_tpu.heads.partial_fc import (
    PFCConfig,
    remap_labels,
    sample_columns,
    sample_groups,
    shard_group_masks,
    shard_softmax_ce,
    shard_valid_mask,
)
from fr_tpu.models.common import l2_normalize
from fr_tpu.parallel.mesh import (
    BATCH_SPEC,
    CLASS_SPEC as CLASS_SPEC_P,
    DATA_AXIS,
    MODEL_AXIS,
)
from fr_tpu.train.optim import (
    clip_by_global_norm,
    encoder_update,
    pfc_row_update,
    take_rows,
)
from fr_tpu.train.state import TrainState, state_partition_specs

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

# Disjoint RNG stream tags, folded FIRST so the derived fold_in chains live
# in separate subtrees and can never collide across streams (a step counter
# folded at the same depth as a constant tag can reach the tag's value).
STREAM_SAMPLE = 0
STREAM_AUGMENT = 1
STREAM_DROPOUT = 2


def stream_key(key, stream: int, *folds):
    k = jax.random.fold_in(key, stream)
    for f in folds:
        k = jax.random.fold_in(k, f)
    return k


def make_train_step(conf, mesh: Mesh, encoder, pfc_cfg: PFCConfig,
                    donate: bool = True,
                    augment_cfg: Optional[tuple] = None) -> Callable:
    """Build the jitted train step.

    Returns step(state, images, labels, lr, key) -> (state, metrics) with
      images : (global_B, H, W, C) float32 — or uint8 when augment_cfg is
               given, in which case the batched augmentation pipeline
               (fr_tpu/data/augment.py, replacing the reference's
               albumentations CPU transforms utils/data_partial.py:134-164)
               runs on device as its own jitted dispatch feeding the step
      labels : (global_B,) int32 global class ids, replicated
      lr     : scalar f32 (epoch-stepped schedule, reference utils/trainer.py)
      key    : jax.random key for negative sampling + augmentation
    """
    num_local = pfc_cfg.num_local
    optimizer = conf.optimizer_name
    model_size = mesh.shape[MODEL_AXIS]
    single = mesh.devices.size == 1

    def _device_step(state: TrainState, images, labels, lr, key,
                     didx, midx, data_axis: Optional[str],
                     model_axis: Optional[str]):
        """Per-device step body. `labels` is the full REPLICATED label vector
        (labels are tiny); this keeps the sampled class set provably
        replicated over 'data' for shard_map's replication checker and avoids
        the reference's per-step label all_gather (nets/PartialFC.py:183)."""
        b_loc = images.shape[0]
        row_size = model_size * b_loc

        dev_linear = didx * model_size + midx
        # dropout / stochastic-depth rng (AlterNet/Swin heads use Dropout and
        # DropPath; reference nets/AlterNet_SwinV2_FAN.py:668, :427)
        k_drop = stream_key(key, STREAM_DROPOUT, state.step, dev_linear)

        # ---- negative sampling (no grad; reference nets/PartialFC.py:92-131).
        # Positives are forced in from the *global* batch so the sampled set
        # is identical across the 'data' axis and the row update is uniform.
        class_start = midx * num_local
        valid = shard_valid_mask(pfc_cfg, midx)
        gidx = None
        if pfc_cfg.sampling:
            loc_all = labels - class_start
            owned_all = (loc_all >= 0) & (loc_all < num_local)
            k = stream_key(key, STREAM_SAMPLE, state.step, midx)
            if pfc_cfg.sample_block > 1:
                # block-aligned sampling → Pallas grouped gather + in-place
                # update (fr_tpu/ops/sparse_rows.py; VERDICT round-2 #1).
                # All masks at GROUP granularity and col_valid arithmetic —
                # row-granular masks alone cost ~4 ms/step at C=2M
                # (XPlane trace, ROUND3_NOTES.md).
                from fr_tpu.ops.sparse_rows import (expand_group_index,
                                                    grouped_gather)
                gpos, gvalid = shard_group_masks(pfc_cfg, midx, loc_all,
                                                 owned_all)
                gidx = sample_groups(pfc_cfg, k, gpos, gvalid)
                idx = expand_group_index(gidx, pfc_cfg.sample_block)
                col_valid = (class_start + idx) < pfc_cfg.num_classes
                w_rows = grouped_gather(state.pfc.weight, gidx,
                                        pfc_cfg.sample_block)
            else:
                pos_mask = jnp.zeros((num_local,), jnp.int32).at[
                    jnp.where(owned_all, loc_all, 0)].max(
                    owned_all.astype(jnp.int32)) > 0
                idx = sample_columns(pfc_cfg, k, pos_mask, valid)
                col_valid = valid[idx]
                w_rows = take_rows(state.pfc.weight, idx)
        else:
            idx = None
            col_valid = valid
            w_rows = state.pfc.weight

        # Column labels for this data-row's samples
        # (reference nets/PartialFC.py:186-193).
        if row_size == labels.shape[0]:
            labels_row = labels
        else:
            labels_row = lax.dynamic_slice_in_dim(labels, didx * row_size,
                                                  row_size)
        loc_row = labels_row - class_start
        owned_row = (loc_row >= 0) & (loc_row < num_local)
        if pfc_cfg.sampling:
            label_cols = remap_labels(pfc_cfg, idx, loc_row, owned_row)
        else:
            label_cols = jnp.where(owned_row, loc_row, -1)

        def loss_fn(params, w_act):
            emb, updates = encoder.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop})
            emb = l2_normalize(emb.astype(jnp.float32))
            if model_axis is not None:
                emb = lax.all_gather(emb, model_axis, tiled=True)
            per_sample = shard_softmax_ce(pfc_cfg, emb, label_cols,
                                          w_act, col_valid, model_axis)
            # mean over this data-row's samples, then over rows = global mean
            # over the full batch (reference nets/PartialFC.py:461).
            loss = per_sample.mean()
            if data_axis is not None:
                loss = lax.pmean(loss, data_axis)
            return loss, updates.get("batch_stats", {})

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, new_bs), (g_enc, g_rows) = grad_fn(state.params, w_rows)

        # No manual grad psum: under shard_map, vma-aware AD auto-psums input
        # cotangents over every mesh axis the input is replicated on, so
        # g_enc (replicated params) and g_rows (class shard, replicated over
        # 'data') are already the true global gradients — the automatic
        # equivalent of the reference's DDP all-reduce + AllGatherFunc
        # backward reduce-to-owner (nets/PartialFC.py:505-522).
        # Running BN stats: averaged across devices (training normalisation
        # already used local stats; the reference leaves per-rank stats
        # unsynced and checkpoints rank 0's — we average instead).
        if not single:
            new_bs = jax.tree.map(
                lambda x: lax.pmean(x, (DATA_AXIS, MODEL_AXIS)), new_bs)

        # Encoder: clip global-norm 5 then update
        # (reference model/FR_PartialFC.py:178-188).
        g_enc, grad_norm = clip_by_global_norm(g_enc, 5.0)
        count = state.step + 1
        new_params, new_opt = encoder_update(
            optimizer, conf, state.params, g_enc, state.opt_slots, lr, count)

        # Head: sampled-row update on the local shard (functional stand-in for
        # the reference's optimizer-state swap, nets/PartialFC.py:120-143).
        # The head keeps its own AdamW step counter like the reference's
        # PartialFCAdamW.step (nets/PartialFC.py:297,327).
        new_w, new_slots = pfc_row_update(
            optimizer, conf, state.pfc.weight, state.pfc.slots, idx, g_rows,
            lr, state.pfc.count + 1, gidx=gidx, block=pfc_cfg.sample_block)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_slots=new_opt,
            pfc=state.pfc.replace(weight=new_w, slots=new_slots,
                                  count=state.pfc.count + 1),
        )
        metrics = {"loss": loss, "grad_norm": grad_norm, "lr": lr}
        return new_state, metrics

    def per_device(state, images, labels, lr, key):
        return _device_step(state, images, labels, lr, key,
                            lax.axis_index(DATA_AXIS),
                            lax.axis_index(MODEL_AXIS),
                            DATA_AXIS, MODEL_AXIS)

    def single_device(state, images, labels, lr, key):
        zero = jnp.zeros((), jnp.int32)
        return _device_step(state, images, labels, lr, key, zero, zero,
                            None, None)

    compiled = None

    def build(state: TrainState):
        donate_args = (0,) if donate else ()
        if single:
            return jax.jit(single_device, donate_argnums=donate_args)
        state_specs = state_partition_specs(state)
        mapped = shard_map(
            per_device, mesh=mesh,
            in_specs=(state_specs, BATCH_SPEC, P(), P(), P()),
            out_specs=(state_specs, P()),
        )
        return jax.jit(mapped, donate_argnums=donate_args)

    # On-device augmentation runs as its OWN jitted dispatch feeding the step
    # (uint8 in → normalised f32 out, device-resident). Inlining it into the
    # train-step program trips an XLA:TPU scheduling pathology (measured 40×
    # step slow-down); as a separate program it costs ~5 ms at b=256.
    if augment_cfg is not None:
        from fr_tpu.data.augment import augment_impl

        @jax.jit
        def _augment(key, step_no, images):
            k = stream_key(key, STREAM_AUGMENT, step_no)
            return augment_impl(k, images, augment_cfg)

    def step(state, images, labels, lr, key):
        nonlocal compiled
        if compiled is None:
            compiled = build(state)
        if augment_cfg is not None:
            images = _augment(key, state.step, images)
        lr = jnp.asarray(lr, jnp.float32)
        return compiled(state, images, labels, lr, key)

    # unjitted single-device body, composable under lax.scan (multi-step
    # dispatch amortises per-dispatch host/tunnel overhead — scripts/
    # scan_probe.py measures it; only valid at mesh size 1, the shard_map
    # body needs axis context)
    if single:
        step.device_body = single_device
    return step


def make_gspmd_train_step(conf, mesh: Mesh, encoder, pfc_cfg: PFCConfig,
                          donate: bool = True,
                          augment_cfg: Optional[tuple] = None) -> Callable:
    """GSPMD/pjit lowering of the train step: one dense global program with
    sharding constraints; XLA's SPMD partitioner inserts the collectives.

    Semantics vs the shard_map path: identical math and identical per-shard
    sampling RNG, except BatchNorm statistics are computed over the GLOBAL
    batch (sync-BN) rather than per device — the reference uses local BN
    (DDP broadcast_buffers=False, model/FR_PartialFC.py:98), so the
    shard_map path is the reference-faithful default; this path is the
    multi-chip performance alternative (shard_map's manual lowering loses
    XLA fusions on some stacks).
    """
    num_local = pfc_cfg.num_local
    optimizer = conf.optimizer_name
    M = mesh.shape[MODEL_AXIS]
    C_pad = pfc_cfg.num_classes_padded
    num_sample = pfc_cfg.num_sample
    multi = mesh.devices.size > 1
    # The fused attention kernels stay under GSPMD (round 5): their
    # custom_partitioning wrappers (ops/fused_window_attn._make_cp)
    # partition batch-locally over the window axis, so the pjit lowering
    # no longer sheds the kernels onto the jnp path on multi-device
    # meshes (VERDICT r4 #4 / missing #3).

    def constrain(x, spec):
        if multi:
            return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
        return x

    def step_impl(state: TrainState, images, labels, lr, key):
        images = constrain(images, BATCH_SPEC)
        k_drop = stream_key(key, STREAM_DROPOUT, state.step)

        valid = jnp.arange(C_pad) < pfc_cfg.num_classes
        if pfc_cfg.sampling:
            k0 = stream_key(key, STREAM_SAMPLE, state.step)
            block = pfc_cfg.sample_block
            gidx2d = None
            if block > 1:
                # block-aligned sampling, same group RNG stream as the
                # shard_map path (sample_groups). Since round 5 the
                # grouped gather/update run the SAME pallas kernels as the
                # shard_map path via their custom_partitioning wrappers
                # (ops/sparse_rows.sharded_grouped_*, class-sharded over
                # 'model'); masks stay at group granularity (no
                # C_pad-sized arrays).
                ngl = num_local // block
                gpos = (jnp.zeros((M * ngl,), jnp.int32)
                        .at[labels // block].max(1) > 0).reshape(M, ngl)
                shard_row0 = (jnp.arange(M)[:, None] * num_local
                              + jnp.arange(ngl)[None, :] * block)
                gval = shard_row0 < pfc_cfg.num_classes
                perm = jax.vmap(lambda m: jax.random.uniform(
                    jax.random.fold_in(k0, m), (ngl,)))(jnp.arange(M))
                perm = jnp.where(gpos, 2.0, perm)
                perm = jnp.where(gval, perm, -1.0)
                _, gidx2d = lax.top_k(perm, pfc_cfg.num_sample_groups)
                gidx2d = jnp.sort(gidx2d, axis=1)
                idx2d = (gidx2d[:, :, None] * block
                         + jnp.arange(block)[None, None, :]
                         ).reshape(M, num_sample)
            else:
                # per-row sampling RNG stream (fold_in(midx)), vmapped over
                # the shard index so the jaxpr holds ONE RNG program
                # regardless of mesh size (a Python loop emits M copies —
                # fine at M≤8, pathological at pod scale; VERDICT r2 #7)
                pos = jnp.zeros((C_pad,), jnp.int32).at[labels].max(1) > 0
                perm = jax.vmap(lambda m: jax.random.uniform(
                    jax.random.fold_in(k0, m), (num_local,)))(
                    jnp.arange(M))                        # (M, num_local)
                perm = jnp.where(pos.reshape(M, num_local), 2.0, perm)
                perm = jnp.where(valid.reshape(M, num_local), perm, -1.0)
                _, idx2d = lax.top_k(perm, num_sample)    # (M, num_sample)
                idx2d = jnp.sort(idx2d, axis=1)
            idx2d = constrain(idx2d, P(MODEL_AXIS, None))

            if gidx2d is not None:
                from fr_tpu.ops.sparse_rows import sharded_grouped_gather
                gidx2d = constrain(gidx2d, P(MODEL_AXIS, None))
                w_act = sharded_grouped_gather(state.pfc.weight, gidx2d,
                                               block)
                w_act = constrain(w_act, P(MODEL_AXIS, None))
            else:
                w3 = state.pfc.weight.reshape(M, num_local, -1)
                w_act = jnp.take_along_axis(w3, idx2d[:, :, None], axis=1)
                w_act = constrain(w_act, P(MODEL_AXIS, None, None))
                w_act = w_act.reshape(M * num_sample, -1)
            # global row id of each sampled column — arithmetic validity
            # (no C_pad-sized mask gather)
            col_valid = ((jnp.arange(M)[:, None] * num_local + idx2d)
                         < pfc_cfg.num_classes).reshape(-1)

            # label → sampled-column position: shard row + searchsorted
            m_of = labels // num_local
            loc = labels % num_local
            rows = idx2d[m_of]                            # (G, num_sample)
            r = jnp.sum(rows < loc[:, None], axis=1)
            r = jnp.minimum(r, num_sample - 1)
            hit = jnp.take_along_axis(rows, r[:, None], axis=1)[:, 0] == loc
            label_cols = jnp.where(hit, m_of * num_sample + r, -1)
        else:
            idx2d = None
            w_act = state.pfc.weight
            col_valid = valid
            label_cols = jnp.where(labels < pfc_cfg.num_classes, labels, -1)

        def loss_fn(params, w):
            emb, updates = encoder.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop})
            emb = l2_normalize(emb.astype(jnp.float32))
            per_sample = shard_softmax_ce(pfc_cfg, emb, label_cols, w,
                                          col_valid, None)
            return per_sample.mean(), updates.get("batch_stats", {})

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, new_bs), (g_enc, g_rows) = grad_fn(state.params, w_act)

        g_enc, grad_norm = clip_by_global_norm(g_enc, 5.0)
        count = state.step + 1
        new_params, new_opt = encoder_update(
            optimizer, conf, state.params, g_enc, state.opt_slots, lr, count)

        head_count = state.pfc.count + 1
        if pfc_cfg.sampling and pfc_cfg.sample_block > 1:
            from fr_tpu.ops.sparse_rows import sharded_grouped_update
            new_w, new_slots = sharded_grouped_update(
                optimizer, conf, state.pfc.weight, state.pfc.slots, gidx2d,
                g_rows, lr, head_count, pfc_cfg.sample_block)
        elif pfc_cfg.sampling:
            from fr_tpu.train.optim import pfc_row_update_grouped
            new_w, new_slots = pfc_row_update_grouped(
                optimizer, conf, state.pfc.weight, state.pfc.slots, idx2d,
                g_rows, lr, head_count, M)
        else:
            new_w, new_slots = pfc_row_update(
                optimizer, conf, state.pfc.weight, state.pfc.slots, None,
                g_rows, lr, head_count)
        new_w = constrain(new_w, CLASS_SPEC_P)

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_slots=new_opt,
            pfc=state.pfc.replace(weight=new_w, slots=new_slots,
                                  count=state.pfc.count + 1))
        return new_state, {"loss": loss, "grad_norm": grad_norm, "lr": lr}

    compiled = jax.jit(step_impl, donate_argnums=(0,) if donate else ())

    if augment_cfg is not None:
        from fr_tpu.data.augment import augment_impl

        @jax.jit
        def _augment(key, step_no, images):
            k = stream_key(key, STREAM_AUGMENT, step_no)
            return augment_impl(k, images, augment_cfg)

    def step(state, images, labels, lr, key):
        if augment_cfg is not None:
            images = _augment(key, state.step, images)
        return compiled(state, images, labels, jnp.asarray(lr, jnp.float32),
                        key)

    return step


def make_embed_step(conf, mesh: Mesh, encoder) -> Callable:
    """Inference/validation embedding step: optional device resize to
    conf.img_size (the reference resizes val pairs per item,
    utils/data_partial.py:88), encoder in eval mode (BN running stats),
    L2-normalised output (reference model/FR_PartialFC.py:196-218).
    This is THE eval path — FaceRecognitionTask uses it too."""
    img_size = conf.img_size
    # fused attention kernels partition under GSPMD via their
    # custom_partitioning wrappers — no shedding (round 5)

    @jax.jit
    def embed(params, batch_stats, images):
        if mesh.devices.size > 1:
            images = lax.with_sharding_constraint(
                images, NamedSharding(mesh, BATCH_SPEC))
        if images.shape[1] != img_size:
            images = jax.image.resize(
                images, (images.shape[0], img_size, img_size,
                         images.shape[-1]), "bilinear")
        emb = encoder.apply({"params": params, "batch_stats": batch_stats},
                            images, train=False)
        return l2_normalize(emb.astype(jnp.float32))

    return embed


def shard_batch(mesh: Mesh, images, labels):
    """Assemble a global device batch from host arrays.

    Single process: device_put — images sharded over the batch dim, labels
    replicated (tiny; keeps the sampled class set provably replicated).

    Multi process (jax.process_count() > 1): each process holds only its
    LOCAL slice of the global image batch (the loader shards by process, the
    reference's DistributedSampler role — utils/data_partial.py:273) but the
    FULL global label vector (labels come from the sampler index, not from
    decoding, so every process computes them identically from the shared
    epoch-seeded permutation). `jax.make_array_from_process_local_data`
    assembles the jax.Array spanning non-addressable devices — a plain
    device_put of a host-global array cannot (each process only owns its
    local devices).
    """
    img_sharding = NamedSharding(mesh, BATCH_SPEC)
    lab_sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        nproc = jax.process_count()
        global_shape = (images.shape[0] * nproc,) + images.shape[1:]
        assert labels.shape[0] == global_shape[0], (
            f"multi-process shard_batch needs GLOBAL labels "
            f"({global_shape[0]}) alongside local images ({images.shape[0]}) "
            f"— use a process-sharded loader (TrainLoader(process_index=...))")
        imgs = jax.make_array_from_process_local_data(
            img_sharding, images, global_shape)
        labs = jax.make_array_from_process_local_data(
            lab_sharding, labels, labels.shape)
        return imgs, labs
    return (jax.device_put(images, img_sharding),
            jax.device_put(labels, lab_sharding))


def shard_eval_batch(mesh: Mesh, images):
    """Device-batch assembly for eval/embedding: `images` is the HOST-GLOBAL
    flat batch (every process builds the same array from the replicated val
    loader — val sets are tiny, reference utils/data_partial.py:63-92).

    Single process: device_put sharded over the batch dim. Multi process:
    each process contributes its contiguous slice via
    `jax.make_array_from_process_local_data` (a plain device_put of a
    host-global array cannot span non-addressable devices) — the eval
    sibling of shard_batch, so validation runs on ALL ranks instead of the
    reference's rank-0-only stall (reference utils/trainer.py:82-94)."""
    sharding = NamedSharding(mesh, BATCH_SPEC)
    if jax.process_count() > 1:
        nproc = jax.process_count()
        assert images.shape[0] % nproc == 0, (images.shape, nproc)
        per = images.shape[0] // nproc
        local = images[jax.process_index() * per:
                       (jax.process_index() + 1) * per]
        return jax.make_array_from_process_local_data(
            sharding, local, images.shape)
    return jax.device_put(images, sharding)


def fetch_global(x) -> np.ndarray:
    """Host-global numpy from a (possibly multi-process sharded) jax.Array.
    Under process_count > 1 the array spans non-addressable devices, so a
    plain np.asarray raises — gather it to every host instead."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def embed_global_batch(mesh: Mesh, embed_fn, params, batch_stats, flat):
    """Embed a HOST-GLOBAL flat image batch (N, H, W, C) through the jitted
    embed step: pads N up to the device count (one compiled program serves
    ragged tails), assembles the global device batch, and fetches the
    host-global (N, D) embeddings back to every process. THE eval embedding
    path — FaceRecognitionTask._shared_eval_step / cross_test_step and the
    multi-host validation test share it."""
    n = flat.shape[0]
    pad = (-n) % mesh.devices.size
    if pad:
        flat = np.concatenate(
            [flat, np.zeros((pad,) + flat.shape[1:], flat.dtype)])
    xs = shard_eval_batch(mesh, flat)
    emb = embed_fn(params, batch_stats, xs)
    return fetch_global(emb)[:n]


def prefetch_to_device(mesh: Mesh, host_iter, depth: int = 2):
    """Threaded device prefetch: a worker thread pulls (images, labels) from
    host_iter and issues shard_batch/device_put for up to `depth` batches
    ahead, overlapping the H2D transfer with device compute. device_put
    blocks the issuing thread while the bytes move (milliseconds on PCIe,
    much longer over a tunneled runtime), so simply staying one batch ahead
    on the consumer thread is not enough — the transfer must run off-thread.

    The consumer gets device-resident (images, labels) jax.Arrays. Worker
    exceptions re-raise at the consumer. The generator's close() (e.g. an
    exception in the training loop) stops the worker."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    SENTINEL = object()

    def worker():
        try:
            for images, labels in host_iter:
                batch = shard_batch(mesh, np.asarray(images),
                                    np.asarray(labels, np.int32))
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(SENTINEL)
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
