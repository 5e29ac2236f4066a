"""On-TPU: correctness + speed of the paired kernel vs the round-1 kernel
on the Llama-3-8B decode shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.ops.pallas.gemm4bit import gemm_4bit_fused
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
    gemm_4bit_paired,
    pack_npaired,
    _pick_tiles_paired,
)
from bitsandbytes_tpu.utils.benchmark import device_loop_time, sol_fraction

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
code = get_4bit_code("nf4", 64)
BS = 64
M = 16

SHAPES = [(28672, 4096), (6144, 4096), (4096, 4096), (4096, 14336)]

for N, K in SHAPES:
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
    absmax = (rng.random((N, K // BS)) * 2 + 0.1).astype(np.float32)
    # layouts
    pairs = q.reshape(N, K // 2, 2)
    p2d = jnp.asarray((pairs[..., 0] << 4) | pairs[..., 1])
    Pp = jax.device_put(pack_npaired(jnp.asarray(q)))
    am_flat = jnp.asarray(absmax.reshape(-1))
    am_t = jax.device_put(jnp.asarray(absmax.T.copy()))
    A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    # correctness vs each other (old kernel is oracle-verified)
    old = np.asarray(gemm_4bit_fused(A, p2d, am_flat, code, BS, (N, K), out_dtype=jnp.float32))
    for mode in ("subdot", "element"):
        new = np.asarray(
            gemm_4bit_paired(A, Pp, am_t, code, BS, (N, K), out_dtype=jnp.float32, scale_mode=mode)
        )
        err = np.abs(new - old).max() / (np.abs(old).max() + 1e-9)
        print(f"[{N},{K}] {mode} vs old: rel {err:.2e}")
        assert err < 5e-3, err

    def t_old(A):
        return gemm_4bit_fused(A, p2d, am_flat, code, BS, (N, K))

    def t_new(A):
        return gemm_4bit_paired(A, Pp, am_t, code, BS, (N, K), scale_mode="subdot")

    def t_new_el(A):
        return gemm_4bit_paired(A, Pp, am_t, code, BS, (N, K), scale_mode="element")

    bytes_accessed = M * K * 2 + N * K // 2 + (K // BS) * N * 4 + M * N * 4
    for name, fn in (("old", t_old), ("new-subdot", t_new), ("new-element", t_new_el)):
        sec = device_loop_time(fn, (A,), iters=50)
        print(
            f"[{N},{K}] {name}: {sec*1e6:8.1f} us  SoL {sol_fraction(sec, bytes_accessed):.2f}"
        )
