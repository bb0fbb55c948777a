"""Device mesh setup.

The reference's single process-group serves double duty: every NCCL rank is
both a data-parallel replica of the encoder and a class shard of the PartialFC
head (reference model/FR_PartialFC.py:98 + nets/PartialFC.py:50-62). Here we
generalise to an explicit 2-D mesh:

    ('data', 'model')

- the global batch is sharded over the *whole* mesh (both axes flattened),
- the classifier's class axis is sharded over 'model' and replicated over
  'data',
- the reference topology is the special case data=1, model=n_devices.

All collectives ride ICI via XLA (`lax.all_gather`/`psum`/`pmax` inside
shard_map; GSPMD-inserted under jit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
BATCH_SPEC = P((DATA_AXIS, MODEL_AXIS))  # batch dim sharded over both axes
CLASS_SPEC = P(MODEL_AXIS, None)         # classifier weight: class-dim sharded


def make_mesh(data: Optional[int] = None, model: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data','model') mesh.

    Defaults to the reference's topology: model = all devices, data = 1
    (reference: world_size-way class sharding, nets/PartialFC.py:57-62).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None and data is None:
        data, model = 1, n
    elif model is None:
        model = n // data
    elif data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, BATCH_SPEC)


def class_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, CLASS_SPEC)


def local_class_slice(num_classes_padded: int, model_size: int,
                      model_idx) -> tuple:
    """(class_start, num_local) for a model-shard index, equal split over the
    padded class count. The reference's uneven split (num_local varies by
    rank, nets/PartialFC.py:57-62) is replaced by pad-to-equal + validity
    masking to keep shapes static under jit."""
    num_local = num_classes_padded // model_size
    return model_idx * num_local, num_local


def pad_classes(num_classes: int, model_size: int) -> int:
    """Round the class count up to a multiple of the model-axis size."""
    return ((num_classes + model_size - 1) // model_size) * model_size
