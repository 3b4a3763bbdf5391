#!/usr/bin/env bash
# CI entry (reference: tools/ci/build_sif.sh + run_fa4_ci.py — theirs builds
# an Apptainer GPU image; ours is a plain host script since the TPU runtime
# needs no container): full test suite on the virtual CPU mesh, multichip
# dry run, then quick benchmarks if a TPU is attached.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== unit tests (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q

echo "== multichip dry run =="
XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
"

echo "== compiled-TPU gate (skipped if no TPU; CI_TPU=0 to force-skip) =="
# The CPU suite proves interpreter semantics; this gate proves the
# Mosaic-COMPILED kernels (the 138-test compiled matrix incl. varlen and
# paged-quant) plus determinism stress at the reference's 250 reruns
# (tests/test_flash_attn.py:2199).
if [ "${CI_TPU:-1}" != "0" ] && python -c "
import jax, sys; sys.exit(0 if jax.default_backend() == 'tpu' else 1)
" 2>/dev/null; then
    FLASH_ATTN_TPU_TEST_BACKEND=tpu \
    FLASH_ATTN_TPU_STRESS_ITERS="${STRESS_ITERS:-250}" \
    python -m pytest \
        tests/test_flash_attn.py tests/test_kvcache.py \
        tests/test_headdim_v.py tests/test_sparse_and_mods.py \
        tests/test_quant.py tests/test_varlen.py \
        tests/test_block_sparsity.py tests/test_vllm_compat.py \
        tests/test_determinism_stress.py \
        -q -x
else
    echo "no TPU attached (or CI_TPU=0); compiled gate skipped"
fi

echo "== TPU benchmarks (skipped if no TPU) =="
python - <<'EOF'
import jax
if jax.default_backend() == "tpu":
    import subprocess, sys
    subprocess.run([sys.executable, "bench.py"], check=True)
    subprocess.run([sys.executable, "benchmarks/benchmark_flash_attention.py",
                    "--quick"], check=True)
else:
    print("no TPU attached; benchmarks skipped")
EOF
echo "CI OK"
