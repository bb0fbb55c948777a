"""Checkpointing.

Two layers, both a deliberate capability upgrade over the reference (which
saves encoder-only snapshots and has no resume path — reference
utils/trainer.py:107-115, SURVEY §5):

1. Full train-state checkpoints via orbax (params, BN stats, optimizer
   slots, sharded PartialFC head + its slots, step counter) with exact
   resume.
2. Encoder-only export in a reference-compatible shape: an .npz holding the
   flax param/stat tree plus metadata {epoch, name}, mirroring the
   reference's `{epoch}_epoch_encoder.pth` `{model_state_dict, epoch, name}`
   payload. `load_encoder` also accepts real reference .pth files (torch
   deserialisation + layout transfer, fr_tpu/utils/torch_import.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _ckpt_dir(save_dir: str) -> Path:
    return Path(save_dir).absolute() / "state"


def save_train_state(save_dir: str, state, step: int) -> None:
    import orbax.checkpoint as ocp
    path = _ckpt_dir(save_dir)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def latest_step(save_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    path = _ckpt_dir(save_dir)
    if not path.exists():
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()


def restore_train_state(save_dir: str, abstract_state,
                        step: Optional[int] = None):
    """Restore with the target pytree's shardings/dtypes (abstract_state =
    a state pytree, e.g. freshly initialised).

    If the head-table shapes differ between the checkpoint and the target —
    `PFCConfig.num_classes_padded` scales with `sample_block`, so a run
    saved under one sample_block setting has differently-padded pfc tensors
    than a restore under another — the pfc leaves are migrated by
    padding/truncating the class-axis padding tail. That is lossless:
    padding rows are masked out of the softmax and excluded from sampling
    (heads/partial_fc.py shard_valid_mask / sample_groups), so they carry
    no trained information. Any other shape mismatch still fails loudly.
    """
    import orbax.checkpoint as ocp
    path = _ckpt_dir(save_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        try:
            return mgr.restore(step,
                               args=ocp.args.StandardRestore(abstract_state))
        except Exception:
            raw = mgr.restore(step)
    return _migrate_pfc_padding(raw, abstract_state)


def _pad_or_truncate_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    if arr.shape[0] >= rows:
        return arr[:rows]
    pad = np.zeros((rows - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _migrate_pfc_padding(raw, abstract_state):
    """Map a raw (nested-dict) orbax restore onto abstract_state, allowing
    class-axis-0 size differences ONLY inside the pfc subtree (padding-tail
    migration across sample_block settings); see restore_train_state."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    target = serialization.to_state_dict(abstract_state)

    def walk(r, t, path, in_pfc):
        if isinstance(t, dict):
            if not isinstance(r, dict) or set(r) != set(t):
                raise ValueError(
                    f"checkpoint/state structure mismatch at '{path}': "
                    f"{sorted(r) if isinstance(r, dict) else type(r)} vs "
                    f"{sorted(t)}")
            return {k: walk(r[k], t[k], f"{path}/{k}", in_pfc or k == "pfc")
                    for k in t}
        r_arr = np.asarray(r)
        t_shape = tuple(np.shape(t))
        if r_arr.shape == t_shape:
            return r_arr
        if (in_pfc and r_arr.ndim == len(t_shape) and r_arr.ndim >= 1
                and r_arr.shape[1:] == t_shape[1:]):
            return _pad_or_truncate_rows(r_arr, t_shape[0])
        raise ValueError(
            f"checkpoint/state shape mismatch at '{path}': {r_arr.shape} vs "
            f"{t_shape} (only pfc class-axis padding differences are "
            f"migratable)")

    migrated = walk(raw, target, "", False)
    out = serialization.from_state_dict(abstract_state, migrated)
    return jax.tree.map(
        lambda v, ref: (jax.device_put(jnp.asarray(v, getattr(ref, "dtype",
                                                              None)),
                                       ref.sharding)
                        if hasattr(ref, "sharding") else jnp.asarray(v)),
        out, abstract_state)


# ---------------------------------------------------------------------------
# Encoder-only export (reference parity format)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export_encoder(path: str, params, batch_stats, epoch: int,
                   network: str) -> None:
    """Save `{epoch}_epoch_encoder`-style snapshot
    (reference utils/trainer.py:111-115)."""
    flat = {f"params.{k}": v for k, v in _flatten(params).items()}
    flat.update({f"batch_stats.{k}": v
                 for k, v in _flatten(batch_stats).items()})
    np.savez(path, __epoch__=epoch, __name__=network, **flat)


def load_encoder(path: str, network: str) -> Tuple[Dict, Dict, Dict]:
    """Load an encoder snapshot: our .npz or a reference torch .pth
    (with DDP 'module.' stripping, reference model/FR_PartialFC.py:76-90).
    Returns (params, batch_stats, meta)."""
    if str(path).endswith((".pth", ".pt")):
        from fr_tpu.utils.torch_import import load_reference_checkpoint
        params, stats = load_reference_checkpoint(path, network)
        return params, stats, {"epoch": None, "name": network}
    data = np.load(path, allow_pickle=False)
    meta = {"epoch": int(data["__epoch__"]), "name": str(data["__name__"])}
    params_flat = {}
    stats_flat = {}
    for key in data.files:
        if key.startswith("params."):
            params_flat[key[len("params."):]] = data[key]
        elif key.startswith("batch_stats."):
            stats_flat[key[len("batch_stats."):]] = data[key]
    return _unflatten(params_flat), _unflatten(stats_flat), meta
