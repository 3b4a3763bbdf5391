"""Multi-host initialization (the torchrun/`torch.distributed.init_process_group`
analog — reference launches multi-GPU via torchrun, tests/losses/
test_cross_entropy_parallel.py:1-2; on TPU pods the jax.distributed runtime
plus a DCN mesh axis replace the launcher + NCCL).

Usage on each host of a pod slice / multi-slice job:

    from flash_attn_tpu.parallel.multihost import initialize, global_mesh
    initialize()                      # no-op on single-host
    mesh = global_mesh(data=jax.process_count(), model=jax.local_device_count())
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the jax.distributed runtime. With no args, TPU pod metadata
    is auto-discovered (GCE metadata / megascale env); on single host it is
    a no-op. Safe to call twice.

    Must run BEFORE any backend-initializing jax call (jax.devices(),
    jax.process_count(), array creation...) — probing those first would
    initialize a single-process backend and make this a silent no-op.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        if coordinator_address is not None:
            raise  # an explicit multi-process setup failing is an error
    except ValueError:
        if coordinator_address is not None:
            raise
        # Single-host (no coordinator discoverable): run standalone.


def global_mesh(data: int = 1, model: int = 1, context: int = 1):
    """Mesh over ALL processes' devices: the data axis is laid out so its
    outer factor crosses hosts (DCN) and inner axes stay intra-slice (ICI),
    matching the scaling-book recipe of keeping TP/CP on ICI."""
    from flash_attn_tpu.parallel.mesh import make_mesh

    return make_mesh(data=data, model=model, context=context,
                     devices=jax.devices())


def is_primary() -> bool:
    return jax.process_index() == 0
