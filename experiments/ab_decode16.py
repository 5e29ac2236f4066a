"""On-TPU A/B: paired GEMM with BNB_DECODE16=1 (int16 mux) vs =0 (pair-word
trees), same process so pool drift cancels.  Also prints a bf16 canary and
%SoL for context.  Decision input for the decode-path default."""
import os
import numpy as np
import jax
import jax.numpy as jnp

from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import gemm_4bit_paired, pack_npaired
from bitsandbytes_tpu.utils.benchmark import device_loop_time, sol_fraction

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
code = get_4bit_code("nf4", 64)
BS = 64

import sys

SHAPES = [(4096, 4096), (28672, 4096)]
MS = [int(m) for m in (sys.argv[1:] or ["16"])]

for M in MS:
    for N, K in SHAPES:
        q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
        absmax = (rng.random((N, K // BS)) * 2 + 0.1).astype(np.float32)
        Pp = jax.device_put(pack_npaired(jnp.asarray(q)))
        am_t = jax.device_put(jnp.asarray(absmax.T.copy()))
        A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

        def t_bf16(A, W=W):
            return jax.lax.dot_general(
                A, W, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        res = {}
        for flag in ("1", "0"):
            os.environ["BNB_DECODE16"] = flag

            def t_new(A, Pp=Pp, am_t=am_t, N=N, K=K):
                return gemm_4bit_paired(A, Pp, am_t, code, BS, (N, K), scale_mode="subdot")

            res[flag] = device_loop_time(t_new, (A,), iters=30)
        tb = device_loop_time(t_bf16, (A,), iters=30)
        nbytes = N * K // 2 + absmax.nbytes + A.nbytes
        sol1 = sol_fraction(res["1"], nbytes)
        sol0 = sol_fraction(res["0"], nbytes)
        print(
            f"M={M} [{N:6d},{K:6d}] mux16 {res['1']*1e6:8.1f}us (SoL {sol1:.3f})"
            f"  pairword {res['0']*1e6:8.1f}us (SoL {sol0:.3f})"
            f"  ratio mux/pw {res['1']/res['0']:.3f}  bf16 {tb*1e6:8.1f}us",
            flush=True,
        )
