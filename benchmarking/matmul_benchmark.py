"""Fused dequant+GEMM vs dequantize-then-matmul (reference
benchmarking/matmul_benchmark.py), with %SoL reporting."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp

from bitsandbytes_tpu.functional.fourbit import dequantize_4bit, quantize_4bit
from bitsandbytes_tpu.functional.gemm import gemm_4bit
from bitsandbytes_tpu.utils.benchmark import device_loop_time, sol_fraction


def main():
    for M in (1, 16, 256):
        N, K, bs = 14336, 4096, 64
        A = jax.random.normal(jax.random.PRNGKey(0), (M, K)).astype(jnp.bfloat16)
        W = jax.random.normal(jax.random.PRNGKey(1), (N, K), jnp.float32) * 0.02
        packed, qs = quantize_4bit(W, blocksize=bs, layout="2d")
        packed_p, qs_p = quantize_4bit(W, blocksize=bs, layout="paired")
        nbytes = M * K * 2 + N * K // 2 + N * (K // bs) * 4 + M * N * 4

        s0 = device_loop_time(lambda a: gemm_4bit(a, packed_p, qs_p), (A,), iters=50)
        s1 = device_loop_time(lambda a: gemm_4bit(a, packed, qs), (A,), iters=50)

        def dq_mm(a):
            Wd = dequantize_4bit(packed, quant_state=qs).astype(a.dtype)
            return jax.lax.dot_general(a, Wd, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        s2 = device_loop_time(dq_mm, (A,), iters=50)
        print(
            f"M={M:4d}: paired {s0*1e3:7.3f} ms ({100*sol_fraction(s0, nbytes):3.0f}% SoL)"
            f"  fused-2d {s1*1e3:7.3f} ms"
            f"  dequant+mm {s2*1e3:7.3f} ms  speedup {s2/s0:.2f}x"
        )

    # int8 training backward: int8 grad_B (reference autograd/_functions.py:
    # 216-233) vs the fp matmuls it replaces.  M = batch*seq large enough to
    # amortize the quantization passes (measured 1.45x at M=16384 on v5e —
    # the int8 MXU path runs 2x bf16 on 2 of the 3 matmuls).
    import bitsandbytes_tpu as bnb

    M, N, K = 16384, 4096, 4096
    A = jax.random.normal(jax.random.PRNGKey(2), (M, K)).astype(jnp.bfloat16)
    Wf = jax.random.normal(jax.random.PRNGKey(3), (N, K), jnp.float32) * 0.02
    state = bnb.MatmulLtState(has_fp16_weights=True)

    def train_bwd_int8(a, w):
        return jax.grad(lambda ww: jnp.sum(bnb.matmul(a, ww, state) ** 2))(w)

    def train_bwd_fp32(a, w):
        # same work as the custom-vjp path: forward + grad_B + grad_A
        out = jax.lax.dot_general(a.astype(jnp.float32), w,
                                  (((1,), (1,)), ((), ())))
        g = 2.0 * out
        grad_B = jax.lax.dot_general(g, a.astype(jnp.float32), (((0,), (0,)), ((), ())))
        grad_A = jax.lax.dot_general(g, w, (((1,), (0,)), ((), ())))
        return grad_A, grad_B

    si = device_loop_time(lambda a: train_bwd_int8(a, Wf), (A,), iters=20)
    sf = device_loop_time(lambda a: train_bwd_fp32(a, Wf), (A,), iters=20)
    print(
        f"int8 training fwd+bwd (grad_B int8) {si*1e3:7.3f} ms"
        f"  vs fp32 fwd+bwd {sf*1e3:7.3f} ms  speedup {sf/si:.2f}x"
    )


if __name__ == "__main__":
    main()
