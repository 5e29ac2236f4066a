"""Mid-M route crossover sweep (VERDICT r2 item 9): fused paired kernel vs
dequant+MXU route for M in [16, 512] on the Llama-3-8B decode shapes.

The decode16 path changes BOTH routes' decode cost, so re-measure the
crossover after it lands.  Prints per (shape, M) the two route times and
the winner; the table feeds LARGE_M_THRESHOLD / a per-M rule in
functional/gemm.py.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
    gemm_4bit_paired,
    pack_npaired,
    dequantize_paired_fast,
)
from bitsandbytes_tpu.utils.benchmark import device_loop_time

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
code = get_4bit_code("nf4", 64)
code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
BS = 64

SHAPES = [(4096, 4096), (6144, 4096), (28672, 4096), (4096, 14336)]
MS = [16, 32, 64, 128, 256, 384, 512]
# chunk for the slow remote-compile budget: argv = shape_idx [M ...]
if len(sys.argv) > 1:
    SHAPES = [SHAPES[int(sys.argv[1])]]
if len(sys.argv) > 2:
    MS = [int(m) for m in sys.argv[2:]]

a_can = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a_can,), iters=10)
print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)

for N, K in SHAPES:
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
    absmax = (rng.random((N, K // BS)) * 2 + 0.1).astype(np.float32)
    Pp = jax.device_put(pack_npaired(jnp.asarray(q)))
    am_t = jax.device_put(jnp.asarray(absmax.T.copy()))
    for M in MS:
        A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

        def fused(A):
            return gemm_4bit_paired(A, Pp, am_t, code, BS, (N, K))

        def dequant_route(A):
            W = dequantize_paired_fast(Pp, am_t, code=code_t, blocksize=BS)
            return jnp.dot(A, W.T, preferred_element_type=jnp.float32)

        try:
            tf = device_loop_time(fused, (A,), iters=20)
        except Exception as e:
            tf = float("inf"); print(f"  fused FAIL: {str(e)[:80]}")
        try:
            td = device_loop_time(dequant_route, (A,), iters=20)
        except Exception as e:
            td = float("inf"); print(f"  dequant FAIL: {str(e)[:80]}")
        win = "fused" if tf <= td else "DEQUANT"
        print(f"[{N:5d},{K:5d}] M={M:3d}: fused {tf*1e6:8.1f} us  dequant {td*1e6:8.1f} us  -> {win}", flush=True)
