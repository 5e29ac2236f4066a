"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process contributes 4 CPU devices to an 8-device global mesh via
`jax.distributed.initialize` — the SURVEY §4 strategy for exercising
multi-host logic (process-spanning GSPMD arrays + cross-process
collectives) without multi-host hardware.  Run as:

    python tests/multihost_worker.py <process_id> <num_processes> <port>
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# share the suite's persistent compile cache (see tests/conftest.py) —
# this worker's distributed-GSPMD programs are the single slowest compile
# in the suite, and they are identical run-over-run
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import bitsandbytes_tpu as bnb
from bitsandbytes_tpu import parallel as par
from bitsandbytes_tpu.nn.modules import QuantizedTensor

assert len(jax.devices()) == 4 * nproc, jax.devices()

# identical data in every process (same seed)
rng = np.random.default_rng(0)
N, K = 128, 512
W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
A_np = rng.standard_normal((4, K)).astype(np.float32)

qt = QuantizedTensor.quantize(jnp.asarray(W), blocksize=64, layout="paired")
A = jnp.asarray(A_np, jnp.bfloat16)
ref = np.asarray(bnb.matmul_4bit(A, qt.data, qt.state), np.float32)

mesh = Mesh(np.asarray(jax.devices()).reshape(4 * nproc), ("model",))

def put(x, spec):
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, s, lambda idx: np.asarray(x)[idx])

p_g = put(qt.data, P("model", None))       # [N/2, K] row pairs over 8 procs*devs
am_g = put(qt.state.absmax, P(None, "model"))  # [K/bs, N]
A_g = put(A, P())

# packed-payload all-gather matmul across BOTH processes
import dataclasses
state_g = dataclasses.replace(qt.state, absmax=am_g)
out = par.tp_gemm_4bit_allgather(A_g, p_g, state_g, mesh, "model")
# out is replicated: every addressable shard holds the full [4, N] result
out_local = np.asarray(out.addressable_shards[0].data, np.float32)
np.testing.assert_array_equal(out_local, ref)

# and the ring gather/compute-overlap pipeline
out_r = par.tp_gemm_4bit_ring(A_g, p_g, state_g, mesh, "model")
np.testing.assert_array_equal(
    np.asarray(out_r.addressable_shards[0].data, np.float32), ref
)

print(f"proc {pid}: MULTIHOST-OK", flush=True)
