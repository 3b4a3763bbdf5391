"""Device-mesh construction (the TPU-native replacement for the reference's
NCCL ProcessGroup plumbing, flash_attn/utils/distributed.py:20-48 and apex
parallel_state group management).

Axes:
  data    — data parallel (gradients all-reduced by GSPMD)
  model   — tensor parallel (Megatron column/row semantics via PartitionSpecs)
  context — context/sequence parallel for long-context attention (ring over
            ICI; see flash_attn_tpu/parallel/context.py)

Intra-slice axes ride ICI; an outer `dcn` axis (multi-slice) can be added by
passing dcn_data > 1 — jax.experimental.mesh_utils places it on DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    data: int = 1,
    model: int = 1,
    context: int = 1,
    *,
    devices: Optional[Sequence] = None,
    dcn_data: int = 1,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model * context * dcn_data
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    devices = list(devices)[:n]
    if dcn_data > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (data, model, context), (dcn_data, 1, 1), devices=devices
            )
            return Mesh(arr, ("dcn_data", "data", "model", "context"))
        except Exception:
            pass
    arr = np.array(devices).reshape(data, model, context)
    return Mesh(arr, ("data", "model", "context"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded activations/inputs."""
    return NamedSharding(mesh, PartitionSpec(("data",)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
