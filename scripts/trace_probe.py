"""Device-side truth: capture a jax.profiler trace of the R100 train step and
aggregate per-op device time from the XPlane, grouped by op kind (conv fwd /
conv bwd-input / conv bwd-filter / fusion / reduce / ...). This replaces
wall-clock guessing over the tunnel with the chip's own timeline.

    python scripts/trace_probe.py [batch]
"""

import glob
import os
import re
import sys
from collections import defaultdict

import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fr_tpu.configs import load_config  # noqa: E402
from fr_tpu.heads.partial_fc import PFCConfig  # noqa: E402
from fr_tpu.models import build_encoder  # noqa: E402
from fr_tpu.parallel import make_mesh  # noqa: E402
from fr_tpu.train import init_train_state, make_train_step  # noqa: E402
from fr_tpu.train.step import shard_batch  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_classes = int(os.environ.get("TRACE_CLASSES", "86690"))
    sample_rate = float(os.environ.get("TRACE_SAMPLE_RATE", "0.3"))
    network = os.environ.get("TRACE_NETWORK", "ResNet100")
    conf = load_config("ms1m_arcface_122", network=network)
    conf.n_classes = n_classes
    conf.mixed_precision = True
    conf.sample_rate = sample_rate
    mesh = make_mesh()
    pfc_cfg = PFCConfig(
        num_classes=n_classes, embedding_size=conf.emd_size, model_size=1,
        sample_rate=sample_rate, margin=conf.metric, s=conf.loss_s,
        m=conf.loss_m, mixed_precision=True, optimizer=conf.optimizer_name,
        use_fused=os.environ.get("TRACE_FUSED", "0") == "1",
        sample_block=int(os.environ.get("TRACE_SAMPLE_BLOCK", "1")))
    encoder = build_encoder(conf)
    state = jax.jit(lambda k: init_train_state(
        k, conf, encoder, pfc_cfg, conf.img_size))(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, conf.img_size, conf.img_size, 3)
                            ).astype(np.float32)
    y = rng.integers(0, n_classes, batch).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    donate = os.environ.get("TRACE_DONATE", "1") == "1"  # match bench.py
    step = make_train_step(conf, mesh, encoder, pfc_cfg, donate=donate)
    key = jax.random.key(1)
    lr = jnp.float32(0.05)
    for _ in range(2):  # compile + warm
        state, m = step(state, xs, ys, lr, key)
        float(np.asarray(m["loss"]))

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/fr_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = step(state, xs, ys, lr, key)
        float(np.asarray(m["loss"]))

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {trace_dir}"
    pd = jax.profiler.ProfileData.from_file(files[0])

    # find the TPU device plane(s)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        agg = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                name = ev.name
                total += dur
                # classify
                if re.search(r"convolution|conv", name, re.I):
                    if "transpose" in name or "filter" in name:
                        agg["conv (bwd-ish)"] += dur
                    else:
                        agg["conv"] += dur
                elif "fusion" in name:
                    agg["fusion"] += dur
                elif re.search(r"dot|matmul", name, re.I):
                    agg["dot"] += dur
                elif re.search(r"copy|transpose|reshape|bitcast", name, re.I):
                    agg["data-movement"] += dur
                elif re.search(r"reduce", name, re.I):
                    agg["reduce"] += dur
                elif re.search(r"scatter|gather|sort|top-k|topk", name, re.I):
                    agg["gather/scatter/sort"] += dur
                else:
                    agg["other"] += dur
        print(f"total device time (3 steps): {total:.2f} ms "
              f"({total/3:.2f} ms/step)")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"  {k:22s} {v/3:8.2f} ms/step  ({100*v/total:5.1f}%)")

        # top 25 individual events
        ev_agg = defaultdict(float)
        for line in plane.lines:
            for ev in line.events:
                ev_agg[ev.name] += ev.duration_ns / 1e6
        print("-- top events (ms/step):")
        for name, dur in sorted(ev_agg.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {dur/3:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
