"""Device-mesh construction for pjit/SPMD sharding.

The reference has no distributed backend at all (SURVEY.md §2.6: no
torch.distributed/NCCL anywhere; one ``cuda:0`` device). Here the mesh is the
foundation: axis ``data`` shards batches (DP), axis ``model`` shards the
news-embedding table rows (the one large tensor, reference
``components.py:239-257`` holds it in host RAM). On a TPU slice the mesh maps
onto ICI; across slices the data axis spans DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def build_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data_size=-1`` infers the data axis from ``len(devices) / model_size``.
    """
    devices = list(devices if devices is not None else jax.devices())
    model = max(1, config.model_size)
    assert len(devices) % model == 0, (
        f"{len(devices)} devices not divisible by model axis {model}"
    )
    data = config.data_size if config.data_size > 0 else len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (config.data_axis, config.model_axis))


def multihost_init() -> None:
    """Initialize jax.distributed for multi-host pods (no-op when single-host
    or already initialized). Call before any device access on pods."""
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized
