"""Model summary: parameter table + totals.

Equivalent of the reference's torchsummary.summary structural inspection on
rank 0 (reference model/FR_PartialFC.py:115).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _count(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def _bytes(tree) -> int:
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree.leaves(tree))


def model_summary(params: Dict[str, Any], batch_stats=None,
                  head_params: int = 0) -> str:
    lines = ["-" * 64,
             f"{'module':<40}{'params':>12}{'MB':>10}",
             "-" * 64]
    for name in sorted(params):
        sub = params[name]
        lines.append(f"{name:<40}{_count(sub):>12,}"
                     f"{_bytes(sub) / 2**20:>10.2f}")
    total = _count(params)
    lines.append("-" * 64)
    lines.append(f"{'encoder total':<40}{total:>12,}"
                 f"{_bytes(params) / 2**20:>10.2f}")
    if batch_stats:
        lines.append(f"{'BN running stats':<40}{_count(batch_stats):>12,}"
                     f"{_bytes(batch_stats) / 2**20:>10.2f}")
    if head_params:
        lines.append(f"{'PartialFC head (sharded)':<40}{head_params:>12,}"
                     f"{head_params * 4 / 2**20:>10.2f}")
    lines.append("-" * 64)
    return "\n".join(lines)
