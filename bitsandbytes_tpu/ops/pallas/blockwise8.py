"""Blockwise 8-bit quantize/dequantize Pallas kernels.

TPU-native analog of the reference kQuantizeBlockwise/kDequantizeBlockwise
for the 256-entry codebooks (csrc/kernels.cu:269-529).  XLA lowers 256-entry
LUT gathers to a scalar path (~1000x too slow), so:

* dequantize: 8-level select tree over the codebook (255 vselects).
* quantize: rank = #{midpoints < x} via 255 fused compare-accumulates
  (identical to the oracle's searchsorted-left semantics).

Codebooks are compile-time constants; one grid step processes a tile of
whole quantization blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .optim8bit import _decode_tree256, _rank256

__all__ = [
    "dequantize_blockwise_pallas",
    "quantize_blockwise_pallas",
    "pallas_blockwise8_supported",
]


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def pallas_blockwise8_supported(n: int, blocksize: int) -> bool:
    # one tile row per quant block; lanes must hold a whole block; Mosaic
    # needs the sublane (rows-of-blocks) dim divisible by 8
    return (
        blocksize in (128, 256, 512, 1024, 2048, 4096)
        and n >= blocksize
        and (n // blocksize) % 8 == 0
    )


def _dq_kernel(q_ref, am_ref, out_ref, *, code):
    q = q_ref[:].astype(jnp.int32)
    out_ref[:] = (_decode_tree256(q, code) * am_ref[:]).astype(out_ref.dtype)


def _q_kernel(x_ref, *rest, midpoints, code, stochastic):
    # absmax + quantize in ONE VMEM pass (reference kQuantizeBlockwise,
    # kernels.cu:269-375).  Round 1 worked around a TPU-worker fault with
    # multi-output pallas_calls carrying a [TB, 1] output inside fori_loops
    # by hoisting absmax to XLA (a second HBM pass over x); the fault no
    # longer reproduces on the current stack (regression test
    # tests/test_functional.py::test_blockwise8_quantize_kernel_in_loop).
    #
    # ``stochastic`` adds the reference STOCHASTIC template's rounding
    # (kernels.cu:269-375 with rand): move to the adjacent code entry with
    # probability |x - code[q]| / |code[nbr] - code[q]| — in expectation the
    # quantization is unbiased.  The uniform draw comes from the on-core
    # PRNG ("seed" mode, pltpu.prng_random_bits — no HBM traffic for the
    # random stream) or from a precomputed uniform input ("u" mode: the
    # interpret/CPU tier, bit-identical to the jnp oracle's jax.random
    # stream so the move logic is testable off-TPU).
    if stochastic == "seed":
        seed_ref, q_ref, am_ref = rest
        u_ref = None
    elif stochastic == "u":
        u_ref, q_ref, am_ref = rest
        seed_ref = None
    else:
        (q_ref, am_ref) = rest
        seed_ref = u_ref = None
    x = x_ref[:].astype(jnp.float32)
    am = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    am_ref[:] = am
    # reciprocal-multiply, exactly as the oracle (blockwise.py:65-66)
    scaled = jnp.clip(x * (1.0 / jnp.clip(am, 1e-38, None)), -1.0, 1.0)
    q = _rank256(scaled, midpoints)
    if stochastic:
        if stochastic == "seed":
            # Mosaic caps prng_seed at 2 words: mix the grid step into
            # the second (Knuth multiplicative hash, wrapping int32)
            pltpu.prng_seed(
                seed_ref[0], seed_ref[1] ^ (pl.program_id(0) * -1640531527)
            )
            bits = pltpu.prng_random_bits(scaled.shape)
            # 24-bit mantissa-exact uniform in [0, 1); logical shift on the
            # int32 BITCAST (Mosaic has no uint32 -> f32 cast) leaves a
            # non-negative 24-bit value, safe for int32 -> f32
            bits_i32 = bits.astype(jnp.int32) if bits.dtype != jnp.int32 else bits
            u = jax.lax.shift_right_logical(bits_i32, 8).astype(
                jnp.float32
            ) * np.float32(2.0**-24)
        else:
            u = u_ref[:]
        lower = _decode_tree256(q, code)
        nbr = jnp.clip(q + jnp.where(scaled > lower, 1, -1), 0, 255)
        nval = _decode_tree256(nbr, code)
        gap = jnp.abs(nval - lower)
        p_move = jnp.where(
            gap > 0, jnp.abs(scaled - lower) / jnp.maximum(gap, 1e-20), 0.0
        )
        q = jnp.where(u < p_move, nbr, q)
    q_ref[:] = q.astype(jnp.uint8)


def _tiles(nb: int, blocksize: int) -> int:
    # rows-of-blocks per grid step; keep f32 tiles ~<= 512 KB (VMEM holds
    # in+out+pipeline double-buffers + select-tree temporaries); Mosaic
    # requires the sublane dim divisible by 8
    tb = max(8, (1 << 17) // blocksize)
    while nb % tb:
        tb //= 2
    return max(tb, 8)


@functools.partial(jax.jit, static_argnames=("code_t", "blocksize", "dtype"))
def dequantize_blockwise_pallas(q, absmax, *, code_t, blocksize, dtype):
    """q: uint8 codes (any shape, whole blocks); absmax: [nblocks] f32."""
    n = q.size
    nb = n // blocksize
    code = np.asarray(code_t, np.float32)
    TB = _tiles(nb, blocksize)
    out = pl.pallas_call(
        functools.partial(_dq_kernel, code=code),
        grid=(nb // TB,),
        in_specs=[
            pl.BlockSpec((TB, blocksize), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, blocksize), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, blocksize), jnp.dtype(dtype)),
        interpret=_interpret(),
    )(q.reshape(nb, blocksize), absmax.reshape(nb, 1).astype(jnp.float32))
    return out.reshape(q.shape)


@functools.partial(jax.jit, static_argnames=("code_t", "blocksize"))
def quantize_blockwise_pallas(
    x, *, code_t, blocksize, stochastic_seed=None, stochastic_u=None
) -> Tuple[jax.Array, jax.Array]:
    """x: any shape with size % blocksize == 0.  Returns (q uint8, absmax).

    Stochastic rounding (reference STOCHASTIC template, kernels.cu:269-375):
    pass ``stochastic_seed`` ([2] int32, from jax.random.key_data) on TPU —
    the kernel draws its uniforms from the on-core PRNG
    (pltpu.prng_random_bits, seeded per grid step) in the same VMEM pass;
    or ``stochastic_u`` (f32 uniforms, x.size elements) on interpret
    backends / for oracle-exact tests — then the kernel is bit-identical to
    functional.blockwise._stochastic_requant with the same uniforms."""
    n = x.size
    nb = n // blocksize
    code = np.asarray(code_t, np.float32)
    midpoints = ((code[:-1] + code[1:]) * 0.5).astype(np.float32)
    TB = max(8, _tiles(nb, blocksize) // 4)
    while nb % TB and TB > 8:
        TB //= 2
    x2 = x.reshape(nb, blocksize).astype(jnp.float32)
    if stochastic_seed is not None:
        mode = "seed"
        extra_args = [stochastic_seed.astype(jnp.int32)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    elif stochastic_u is not None:
        mode = "u"
        extra_args = [stochastic_u.reshape(nb, blocksize).astype(jnp.float32)]
        extra_specs = [
            pl.BlockSpec((TB, blocksize), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
    else:
        mode = None
        extra_args, extra_specs = [], []
    q, am = pl.pallas_call(
        functools.partial(_q_kernel, midpoints=midpoints, code=code, stochastic=mode),
        grid=(nb // TB,),
        in_specs=[
            pl.BlockSpec((TB, blocksize), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + extra_specs,
        out_specs=[
            pl.BlockSpec((TB, blocksize), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, blocksize), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, *extra_args)
    return q.reshape(x.shape), am.reshape(-1)
