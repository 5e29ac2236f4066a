"""Probe Mosaic semantics needed by the paired-decode kernel:

1. pltpu.bitcast int32 [S, L] -> bf16 [2S, L]: which 16-bit half of the
   int32 lane lands in which bf16 row (sublane mapping)?
2. Per-lane variable shifts (shift_right_logical by a vector amount).
3. Strided row slicing + sub-dot inside a kernel.

Run on the real TPU chip; prints findings.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())


def probe_bitcast():
    # Each int32 lane (r, c): low16 = bf16 bits of 1000+r, high16 = bf16 bits of 2000+r
    def f32_to_bf16_bits(x):
        return (np.float32(x).view(np.uint32) >> 16).astype(np.uint32)

    S, L = 16, 128
    lo = np.zeros((S, L), np.uint32)
    hi = np.zeros((S, L), np.uint32)
    for r in range(S):
        lo[r, :] = f32_to_bf16_bits(1000.0 + r)
        hi[r, :] = f32_to_bf16_bits(2000.0 + r)
    w = (hi << 16) | lo
    w = jnp.asarray(w.view(np.int32))

    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * S, L), jnp.bfloat16),
    )(w)
    col0 = np.asarray(out[:, 0].astype(jnp.float32))
    print("bitcast rows (col 0):", col0.tolist())


def probe_varshift():
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 65536 + 7
    amt = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) % 2) * 16

    def kernel(x_ref, a_ref, o_ref):
        o_ref[:] = jax.lax.shift_right_logical(x_ref[:], a_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(x, amt)
    expect = np.asarray(jax.lax.shift_right_logical(x, amt))
    print("varshift ok:", bool((np.asarray(out) == expect).all()))


def probe_subdot():
    # strided row slice of a bf16 [64, 128] value + dot
    a = jnp.ones((8, 64), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(0), (64, 128)).astype(jnp.bfloat16)

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros_like(o_ref)
        bb = b_ref[:]
        aa = a_ref[:]
        for i in range(2):
            acc += jax.lax.dot_general(
                aa[:, 32 * i : 32 * i + 32],
                bb[32 * i : 32 * i + 32, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(a, b)
    expect = np.asarray(
        jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32))
    )
    print("subdot max err:", float(np.abs(np.asarray(out) - expect).max()))


for name, fn in [("bitcast", probe_bitcast), ("varshift", probe_varshift), ("subdot", probe_subdot)]:
    try:
        fn()
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}")
