"""Benchmark: R100-IR + ArcFace/PartialFC training throughput (imgs/sec/chip).

The reference's north-star metric (BASELINE.md): imgs/sec/chip for
ResNet100 + ArcFace on MS1M-like data. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

vs_baseline = measured / achievable roofline, where the achievable roofline
is the occupancy-aware MXU bound of fr_tpu.utils.flops.achievable_mxu_seconds:
per-conv fwd/dgrad/wgrad time at the chip's peak bf16 rate derated ONLY by
the systolic-array occupancy the operand shapes permit (a 3×3 conv with
C_in=64 cannot fill more than 64 of 128 MXU sublanes in any non-materialising
formulation — measured at exactly that ceiling, ROUND2_NOTES.md). It grants
nothing for elementwise, BN, pooling, optimizer, copies or dispatch — those
must be driven to zero to reach 1.0. The naive 3×fwd-FLOPs ratio (round-1
vs_baseline, which double-counts MXU capability the hardware does not have
at C_in∈{3,64}: ceiling 0.897 even with zero non-matmul time) is reported
alongside as "vs_naive_roofline". The BASELINE target of ≥0.95 of roofline
is interpreted against the achievable bound.
"""

import json
import os
import sys
import time

import numpy as np


def peak_bf16_tflops() -> float:
    """Best-effort peak bf16 TFLOPs for the attached chip."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197.0, "v5litepod": 197.0, "v5e": 197.0,
        "v4": 275.0, "v5p": 459.0, "v6e": 918.0, "v6 lite": 918.0,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 197.0


def main():
    import jax
    import jax.numpy as jnp

    # Remote compiles over the axon tunnel take minutes; persist them.
    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fr_tpu.configs import load_config
    from fr_tpu.heads.partial_fc import PFCConfig
    from fr_tpu.models import build_encoder
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train import init_train_state, make_train_step
    from fr_tpu.train.step import shard_batch

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    n_classes = int(os.environ.get("BENCH_CLASSES", "86690"))
    network = os.environ.get("BENCH_NETWORK", "ResNet100")
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    conf = load_config("ms1m_arcface_122", network=network)
    conf.n_classes = n_classes
    conf.mixed_precision = True
    conf.sample_rate = float(os.environ.get("BENCH_SAMPLE_RATE", "0.3"))

    mesh = make_mesh()
    n_chips = mesh.devices.size
    use_fused = os.environ.get("BENCH_FUSED", "0") == "1"
    pfc_cfg = PFCConfig(
        num_classes=conf.n_classes, embedding_size=conf.emd_size,
        model_size=mesh.shape["model"], sample_rate=conf.sample_rate,
        margin=conf.metric, s=conf.loss_s, m=conf.loss_m,
        mixed_precision=True, optimizer=conf.optimizer_name,
        use_fused=use_fused)

    encoder = build_encoder(conf)
    # jitted init: eager op-by-op init pays ~33ms tunnel RPC per op
    state = jax.jit(lambda k: init_train_state(
        k, conf, encoder, pfc_cfg, conf.img_size))(jax.random.key(0))
    jax.block_until_ready(jax.tree.leaves(state.params)[0])

    # BENCH_AUGMENT=1: uint8 inputs + the full on-device augmentation pipeline
    # BENCH_PACKED=<dir>: stream a real packed corpus (memmap + native gather
    # + double-buffered H2D + on-device augment) instead of a resident tensor
    packed_dir = os.environ.get("BENCH_PACKED")
    augment = os.environ.get("BENCH_AUGMENT", "0") == "1" or bool(packed_dir)
    aug_cfg = None
    rng = np.random.default_rng(0)
    if augment:
        from fr_tpu.data.augment import augment_cfg_from_conf
        aug_cfg = augment_cfg_from_conf(conf)
    step = make_train_step(conf, mesh, encoder, pfc_cfg, augment_cfg=aug_cfg)

    batches = None
    if packed_dir and os.environ.get("BENCH_DEVICE_CORPUS", "0") == "1":
        # TPU-native path for HBM-sized corpora: corpus resident on device,
        # per-step on-device gather, only KBs of indices cross the link
        from fr_tpu.data.device_corpus import DeviceCorpusLoader
        from fr_tpu.data.packed import PackedTrainLoader
        src = PackedTrainLoader(packed_dir, batch)
        loader = DeviceCorpusLoader(src.images, src.labels % n_classes,
                                    batch, mesh)

        def device_batches():
            epoch = 0
            while True:
                for im, lb in loader.epoch(epoch):
                    yield im, lb
                epoch += 1

        batches = device_batches()
        xs, ys = next(batches)
    elif packed_dir:
        from fr_tpu.data.packed import PackedTrainLoader
        from fr_tpu.train.step import prefetch_to_device
        loader = PackedTrainLoader(packed_dir, batch)

        def host_batches():
            epoch = 0
            while True:
                for im, lb in loader.epoch(epoch):
                    yield im, (lb % n_classes).astype(np.int32)
                epoch += 1

        # threaded H2D prefetch: the transfer runs on a worker thread and
        # overlaps device compute (same path the Trainer uses)
        batches = prefetch_to_device(mesh, host_batches(), depth=2)
        xs, ys = next(batches)
    else:
        if augment:
            x = rng.integers(0, 256, (batch, conf.img_size, conf.img_size, 3)
                             ).astype(np.uint8)
        else:
            x = rng.standard_normal(
                (batch, conf.img_size, conf.img_size, 3)).astype(np.float32)
        y = rng.integers(0, conf.n_classes, batch).astype(np.int32)
        xs, ys = shard_batch(mesh, x, y)

    # analytic flop cost of the forward pass, for the roofline denominator
    # (jaxpr traversal, no compile)
    flops_per_step = None
    achievable_s = None
    try:
        from fr_tpu.utils.flops import achievable_mxu_seconds, count_flops
        fwd_fn = lambda p, b, im: encoder.apply(  # noqa: E731
            {"params": p, "batch_stats": b}, im, train=False)
        fwd_args = (state.params, state.batch_stats,
                    jnp.zeros((batch,) + tuple(xs.shape[1:]),
                              jnp.bfloat16 if conf.mixed_precision
                              else jnp.float32))
        fwd = count_flops(fwd_fn, *fwd_args)
        flops_per_step = 3.0 * fwd  # fwd + bwd ≈ 3× fwd (naive)
        achievable_s = achievable_mxu_seconds(
            fwd_fn, peak_bf16_tflops() * 1e12, *fwd_args)
    except Exception:
        pass

    # warmup / compile. NOTE: block_until_ready returns early on the axon
    # remote runtime — only a value fetch truly synchronises.
    key = jax.random.key(1)
    lr = jnp.float32(0.05)
    state, metrics = step(state, xs, ys, lr, key)
    float(metrics["loss"])
    state, metrics = step(state, xs, ys, lr, key)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        if batches is not None:
            xs, ys = next(batches)
        state, metrics = step(state, xs, ys, lr, key)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    imgs_per_sec = batch * steps / dt
    imgs_per_sec_chip = imgs_per_sec / n_chips

    vs_naive = None
    vs_baseline = None
    if flops_per_step:
        peak = peak_bf16_tflops() * 1e12 * n_chips
        roofline_imgs = peak / (flops_per_step / batch)
        vs_naive = imgs_per_sec / roofline_imgs
    if achievable_s:
        # achievable_s is the single-chip MXU floor for one whole batch
        achievable_imgs = batch / achievable_s * n_chips
        vs_baseline = imgs_per_sec / achievable_imgs

    aug_tag = ", on-device augment" if augment else ""
    if packed_dir:
        aug_tag += (", device-resident corpus"
                    if os.environ.get("BENCH_DEVICE_CORPUS", "0") == "1"
                    else ", packed corpus")
    print(json.dumps({
        "metric": f"{network}+{conf.metric} train throughput "
                  f"(b={batch}, C={n_classes}, r={conf.sample_rate}, "
                  f"bf16{aug_tag})",
        "value": round(imgs_per_sec_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
        "vs_naive_roofline": round(vs_naive, 4) if vs_naive else None,
        "step_ms": round(batch / imgs_per_sec * 1e3, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
