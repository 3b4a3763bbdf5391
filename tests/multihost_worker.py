"""Worker for the real multi-process distributed test (launched by
tests/test_multihost.py). The JAX analog of the reference's torchrun
multi-GPU workers (tests/models/test_gpt_parallel.py launch comments):
every process initializes jax.distributed against a real coordinator,
contributes its own host-local shard, and the global computation must
equal the single-process golden run.

Run directly: python multihost_worker.py <pid> <nproc> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

from flash_attn_tpu.parallel.multihost import initialize, is_primary

initialize(coordinator_address=f"localhost:{port}", num_processes=nproc,
           process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.flash_attn_interface import flash_attn_func

# DCN axis = data (across processes), ICI axis = model (local devices) —
# the scaling-book layout multihost.global_mesh encodes.
mesh = Mesh(np.array(jax.devices()).reshape(nproc, 4), ("data", "model"))

# --- 1. Cross-process data-parallel attention forward ----------------------
b_local, s, h, d = 2, 64, 4, 32
rng = np.random.RandomState(7)  # SAME seed everywhere: golden is replicated
q_all = rng.randn(b_local * nproc, s, h, d).astype(np.float32)
k_all = rng.randn(b_local * nproc, s, h, d).astype(np.float32)
v_all = rng.randn(b_local * nproc, s, h, d).astype(np.float32)

mine = slice(pid * b_local, (pid + 1) * b_local)
to_global = lambda x: multihost_utils.host_local_array_to_global_array(
    jnp.asarray(x[mine]), mesh, P("data", None, None, None)
)
qg, kg, vg = to_global(q_all), to_global(k_all), to_global(v_all)


@jax.jit
def attn_loss(q, k, v):
    out = flash_attn_func(q, k, v, causal=True, interpret=True)
    return (out.astype(jnp.float32) ** 2).sum()  # psum over the data axis


loss = float(attn_loss(qg, kg, vg))
golden = float(
    (flash_attn_func(jnp.asarray(q_all), jnp.asarray(k_all),
                     jnp.asarray(v_all), causal=True,
                     interpret=True).astype(jnp.float32) ** 2).sum()
)
assert abs(loss - golden) < 1e-2 * abs(golden), (loss, golden)

# --- 2. Cross-process DP gradient (the DDP-allreduce contract) -------------
w_np = rng.randn(16, 16).astype(np.float32)
x_all = rng.randn(8 * nproc, 16).astype(np.float32)
xg = multihost_utils.host_local_array_to_global_array(
    jnp.asarray(x_all[pid * 8:(pid + 1) * 8]), mesh, P("data", None)
)
w = jax.device_put(jnp.asarray(w_np), NamedSharding(mesh, P(None, "model")))


@jax.jit
def grad_w(w, x):
    return jax.grad(lambda w: ((x @ w) ** 2).sum())(w)


g = grad_w(w, xg)  # GSPMD inserts the cross-host reduction
g_local = np.asarray(
    multihost_utils.process_allgather(
        jax.device_put(g, NamedSharding(mesh, P(None, None))), tiled=True
    )
)
g_gold = np.asarray(jax.grad(
    lambda w: ((jnp.asarray(x_all) @ w) ** 2).sum())(jnp.asarray(w_np)))
assert np.abs(g_local - g_gold).max() < 1e-2 * max(np.abs(g_gold).max(), 1.0)

if is_primary():
    print("MULTIHOST_OK", loss)
