"""flash_attn_tpu — TPU-native flash-attention framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
vllm-project/flash-attention (reference public API:
flash_attn/__init__.py:8-16).
"""

__version__ = "0.1.0"

from flash_attn_tpu.flash_attn_interface import (
    compile_flash_attn_varlen_func_from_specs,
    flash_attn_combine,
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_with_kvcache,
    sparse_attn_func,
)
from flash_attn_tpu.kernels.block_sparsity import (
    BlockSparseTensors,
    compute_block_sparsity,
    compute_block_sparsity_varlen,
)
from flash_attn_tpu.kernels.flash_varlen import (
    VarlenPlan,
    make_varlen_plan,
)

__all__ = [
    "BlockSparseTensors",
    "VarlenPlan",
    "compute_block_sparsity",
    "compute_block_sparsity_varlen",
    "make_varlen_plan",
    "compile_flash_attn_varlen_func_from_specs",
    "flash_attn_combine",
    "flash_attn_func",
    "flash_attn_kvpacked_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_with_kvcache",
    "sparse_attn_func",
]
