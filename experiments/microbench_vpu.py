"""VPU primitive-throughput microbench for decode-kernel design decisions.

Question: do bf16 element ops (cmp/select/fma) run at 2x the int32/f32 rate
on this v5e (packed two-per-32-bit-lane), and how fast are the building
blocks of candidate NF4 decode schemes?  Each kernel runs REPS iterations of
an op bundle over a VMEM-resident tile with a loop-carried dependency (no
hoisting possible), so the measured marginal time is pure ALU throughput.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import _decode_pair_word
from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.utils.benchmark import device_loop_time

REPS = 64
SHAPE_I32 = (256, 1024)  # 256k lanes
SHAPE_BF16 = (512, 1024)  # same element count as the decoded output

CODE = tuple(float(x) for x in np.asarray(get_4bit_code("nf4", 64)).reshape(-1))


def run_kernel(name, kernel, x, ops_per_elem_per_rep, elems):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    sec = device_loop_time(f, (x,), iters=30)
    total_ops = ops_per_elem_per_rep * REPS * elems
    print(
        f"{name:28s}: {sec*1e6:8.1f} us  "
        f"{total_ops/sec/1e12:6.2f} Tops/s ({ops_per_elem_per_rep} ops/el/rep)"
    )
    return total_ops / sec


# -- kernels -----------------------------------------------------------------


def k_int32_tree(x_ref, o_ref):
    """Current decode: full pair-word decode per int32 lane (one byte)."""
    def body(i, acc):
        p = (acc ^ i) & 255
        return acc ^ _decode_pair_word(p, CODE)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_int32_cmpsel(x_ref, o_ref):
    """Plain int32 compare+select chain (2 ops/el/rep)."""
    def body(i, acc):
        return jnp.where(acc < i * 3, acc + 1, acc - 1)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_bf16_cmpsel(x_ref, o_ref):
    """bf16 compare+select chain (2 bf16 ops + 2 adds /el/rep)."""
    def body(i, acc):
        t = jnp.bfloat16(1.0) * i.astype(jnp.bfloat16)
        return jnp.where(acc < t, acc + jnp.bfloat16(1), acc - jnp.bfloat16(1))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_f32_cmpsel(x_ref, o_ref):
    def body(i, acc):
        t = jnp.float32(1.0) * i.astype(jnp.float32)
        return jnp.where(acc < t, acc + jnp.float32(1), acc - jnp.float32(1))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_bf16_fma(x_ref, o_ref):
    def body(i, acc):
        return acc * jnp.bfloat16(0.999) + jnp.bfloat16(0.0625)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_bf16_tree16(x_ref, o_ref):
    """Candidate: 15-node select tree in bf16 over values 128..143."""
    leaves = [jnp.bfloat16(c) for c in CODE]

    def tree(x, lo, hi):
        if hi - lo == 1:
            return jnp.broadcast_to(leaves[lo], x.shape)
        mid = (lo + hi) // 2
        return jnp.where(x < jnp.bfloat16(128 + mid), tree(x, lo, mid), tree(x, mid, hi))

    def body(i, acc):
        x = acc + jnp.bfloat16(0)  # dependency
        u = tree(x, 0, 16)
        return jnp.where(u > 0, acc, acc + jnp.bfloat16(0.0))  # keep range 128..143

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_int32_mul(x_ref, o_ref):
    def body(i, acc):
        return (acc * jnp.int32(0x3F81)) ^ i

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_xbuild(x_ref, o_ref):
    """Candidate: the 5-op packed (v+128 | v'+128<<16) bf16-pattern build."""
    C = jnp.int32(0x43004300 - (1 << 32))

    def body(i, acc):
        p = (acc ^ i) & 255
        w = C | (p >> 4) | ((p & 15) << 16)
        return acc ^ w

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_int32_varshift(x_ref, o_ref):
    def body(i, acc):
        return acc ^ jax.lax.shift_right_logical(acc ^ i, acc & 16)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, 256, SHAPE_I32), jnp.int32)
    ei = SHAPE_I32[0] * SHAPE_I32[1]
    xb = jnp.asarray(128 + (rng.integers(0, 16, SHAPE_BF16)), jnp.bfloat16)
    eb = SHAPE_BF16[0] * SHAPE_BF16[1]
    xf = jnp.asarray(rng.standard_normal(SHAPE_I32), jnp.float32)

    import sys as _s
    def safe(*a):
        try:
            run_kernel(*a)
        except Exception as e:
            print(a[0], "FAILED:", str(e)[:120])
        _s.stdout.flush()
    safe("int32 cmp+sel (+2 add)", k_int32_cmpsel, xi, 4, ei)
    safe("f32   cmp+sel (+2 add)", k_f32_cmpsel, xf, 4, ei)
    safe("bf16  fma", k_bf16_fma, xb, 2, eb)
    safe("int32 var-shift (3 ops)", k_int32_varshift, xi, 3, ei)
    safe("int32 FULL pair decode", k_int32_tree, xi, 41, ei)
    safe("xbuild 5-op+2", k_xbuild, xi, 7, ei)
    safe("int32 mul (+1 xor)", k_int32_mul, xi, 2, ei)


if __name__ == "__main__":
    main()
