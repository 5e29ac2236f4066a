"""Tile/mode sweep for the paired kernel on the llama decode shapes."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import gemm_4bit_paired, pack_npaired
from bitsandbytes_tpu.utils.benchmark import device_loop_time

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
code = get_4bit_code("nf4", 64)
BS = 64
M = 16

SHAPES = [(28672, 4096), (6144, 4096), (4096, 4096), (4096, 14336)]
TILES = [(4096, 512), (3072, 512), (2048, 1024), (1024, 1024),
         (512, 512), (512, 2048), (1024, 2048), (2048, 2048)]

for N, K in SHAPES:
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
    absmax = (rng.random((N, K // BS)) * 2 + 0.1).astype(np.float32)
    Pp = jax.device_put(pack_npaired(jnp.asarray(q)))
    am_t = jax.device_put(jnp.asarray(absmax.T.copy()))
    A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    for tn, tk in TILES:
        if N % tn or K % tk or tk % BS or (tn // 2) % 8 or tk % 128 or (tk // BS) % 8:
            continue
        for mode in ("subdot", "element"):
            try:
                def fn(A):
                    return gemm_4bit_paired(
                        A, Pp, am_t, code, BS, (N, K),
                        scale_mode=mode, tiles=(M, tn, tk),
                    )
                sec = device_loop_time(fn, (A,), iters=50)
                print(f"[{N},{K}] TN={tn} TK={tk} {mode}: {sec*1e6:8.1f} us", flush=True)
            except Exception as e:
                print(f"[{N},{K}] TN={tn} TK={tk} {mode}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
                sys.exit(1)
