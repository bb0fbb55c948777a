"""Train state: the full functional training state as one pytree.

A capability upgrade over the reference (which checkpoints only the encoder,
reference utils/trainer.py:107-115): everything needed for exact resume lives
here — encoder params + BN stats, encoder optimizer slots, the sharded
PartialFC head with its optimizer slots, and the step counter.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import PartitionSpec as P

from fr_tpu.heads.partial_fc import PFCConfig, PFCState, init_pfc_state
from fr_tpu.parallel.mesh import CLASS_SPEC
from fr_tpu.train.optim import init_slots


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                    # global step counter (int32)
    params: Any                          # encoder params (fp32 master)
    batch_stats: Any                     # encoder BN running stats
    opt_slots: Dict[str, Any]            # encoder optimizer slots
    pfc: PFCState                        # sharded head + its slots


def init_train_state(key: jax.Array, conf, encoder, pfc_cfg: PFCConfig,
                     img_size: int) -> TrainState:
    k_enc, k_pfc = jax.random.split(key)
    variables = encoder.init(k_enc, jnp.zeros((1, img_size, img_size, 3),
                                              jnp.float32), train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_slots=init_slots(conf.optimizer_name, params),
        pfc=init_pfc_state(k_pfc, pfc_cfg),
    )


def state_partition_specs(state: TrainState) -> TrainState:
    """PartitionSpec pytree matching the state: PFC tensors are class-sharded
    P('model', None), everything else replicated."""
    specs = jax.tree.map(lambda _: P(), state)
    return specs.replace(pfc=specs.pfc.replace(
        weight=CLASS_SPEC,
        slots=jax.tree.map(lambda _: CLASS_SPEC, specs.pfc.slots),
    ))
