"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpreter mode off-TPU (kernels auto-detect via
flash_attn_tpu.kernels.common.interpret_mode). Sharding/parallelism tests use
the 8 virtual CPU devices — the JAX answer to the reference's
torchrun-launched multi-GPU tests (tests/models/test_gpt_parallel.py:22-43),
with no real hardware needed.

Note: the environment may pre-register an accelerator platform and pin
JAX_PLATFORMS; `jax.config.update` below overrides it unconditionally —
env-var setdefault is not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Escape hatch: FLASH_ATTN_TPU_TEST_BACKEND=tpu runs the suites compiled on
# the real chip (slow: remote compiles) instead of CPU interpreter mode.
if os.environ.get("FLASH_ATTN_TPU_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
