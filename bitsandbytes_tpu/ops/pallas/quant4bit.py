"""Pallas 4-bit blockwise *quantize* kernel.

TPU-native analog of the reference ``kQuantizeBlockwise`` FP4/NF4 templates
(csrc/kernels.cu:269-463): per quantization block, absmax reduce + midpoint
compare-rank + bit-pattern mapping, one pass through VMEM.

XLA's lowering of the jnp tier leaves the 15 compare-accumulates unfused
(measured ~10 ms for a 117M-param weight on v5e — 15 HBM passes; the
HBM-bound floor is ~0.7 ms).  Here everything happens on the tile in VMEM.

The kernel emits *unpacked* uint8 codes [N, K] plus absmax [N, K/bs]; the
caller packs pairs (layout-dependent byte order) and transposes absmax with
XLA — both are single cheap elementwise passes.  Semantics are bit-identical
to the jnp oracle (functional/fourbit.py): ``scale = 1/clip(absmax, 1e-38)``,
``scaled = clip(x*scale, -1, 1)``, ``rank = #{midpoints < scaled}``, then
rank -> bit-pattern order map for FP4/int4/af4 (NF4's table is sorted, so
rank == pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantize_4bit_codes_pallas", "pallas_quant4bit_supported"]


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def _rank16(scaled, midpoints: np.ndarray):
    rank = jnp.zeros(scaled.shape, jnp.int32)
    for m in midpoints:
        rank = rank + (scaled > np.float32(m)).astype(jnp.int32)
    return rank


def _order_tree(rank, order: np.ndarray):
    """rank (0..15) -> bit pattern via a 15-select tree over the argsort
    order (FP4/int4/af4 codebooks are in bit-pattern order, SURVEY.md §8.2)."""
    def tree(lo, hi):
        if hi - lo == 1:
            return jnp.full(rank.shape, np.int32(order[lo]), jnp.int32)
        mid = (lo + hi) // 2
        return jnp.where(rank < mid, tree(lo, mid), tree(mid, hi))

    return tree(0, 16)


def _val_tree16(rank, values: np.ndarray):
    """rank (0..15) -> f32 codebook value via a 15-select tree (no gather)."""
    def tree(lo, hi):
        if hi - lo == 1:
            return jnp.full(rank.shape, np.float32(values[lo]), jnp.float32)
        mid = (lo + hi) // 2
        return jnp.where(rank < mid, tree(lo, mid), tree(mid, hi))

    return tree(0, 16)


def _stochastic_move16(rank, scaled, u, sorted_code: np.ndarray):
    """Distance-proportional move to the value-adjacent code entry, in RANK
    (value-sorted) space — the 4-bit analog of the reference STOCHASTIC
    8-bit template (kernels.cu:269-375; the reference wires stochastic only
    for General8bit — this is the TPU-native extension to 4-bit)."""
    lower = _val_tree16(rank, sorted_code)
    nbr = jnp.clip(rank + jnp.where(scaled > lower, 1, -1), 0, 15)
    nval = _val_tree16(nbr, sorted_code)
    gap = jnp.abs(nval - lower)
    p_move = jnp.where(
        gap > 0, jnp.abs(scaled - lower) / jnp.maximum(gap, 1e-20), 0.0
    )
    return jnp.where(u < p_move, nbr, rank)


def _q4_kernel(
    x_ref, *rest, midpoints, order, blocksize, identity_order, sorted_code, stochastic
):
    if stochastic == "seed":
        seed_ref, q_ref, am_ref = rest
        u_ref = None
    elif stochastic == "u":
        u_ref, q_ref, am_ref = rest
        seed_ref = None
    else:
        q_ref, am_ref = rest
        seed_ref = u_ref = None
    x = x_ref[:].astype(jnp.float32)
    TK = x.shape[1]
    nb = TK // blocksize
    # per-block absmax (cheap reduces), then ONE full-width scaled+rank pass
    # — per-block 64-lane slices would idle half of every 128-lane vector op
    am_parts = [
        jnp.max(jnp.abs(x[:, b * blocksize : (b + 1) * blocksize]), axis=1, keepdims=True)
        for b in range(nb)
    ]
    am = jnp.concatenate(am_parts, axis=1) if nb > 1 else am_parts[0]
    # exact value-preserving f32 scale broadcast (an expander matmul would
    # round the scale to bf16): lane-broadcast each block's scale, concat
    scale_parts = [
        jnp.broadcast_to(1.0 / jnp.clip(p, 1e-38, None), (x.shape[0], blocksize))
        for p in am_parts
    ]
    scale_full = jnp.concatenate(scale_parts, axis=1) if nb > 1 else scale_parts[0]
    scaled = jnp.clip(x * scale_full, -1.0, 1.0)
    q = _rank16(scaled, midpoints)
    if stochastic:
        if stochastic == "seed":
            # Mosaic caps prng_seed at 2 words: mix the grid step into
            # the second (Knuth multiplicative hash, wrapping int32)
            pltpu.prng_seed(
                seed_ref[0], seed_ref[1] ^ (pl.program_id(0) * -1640531527)
            )
            bits = pltpu.prng_random_bits(scaled.shape)
            # int32 bitcast + logical shift: Mosaic has no uint32 -> f32 cast
            bits_i32 = bits.astype(jnp.int32) if bits.dtype != jnp.int32 else bits
            u = jax.lax.shift_right_logical(bits_i32, 8).astype(
                jnp.float32
            ) * np.float32(2.0**-24)
        else:
            u = u_ref[:]
        q = _stochastic_move16(q, scaled, u, sorted_code)
    if not identity_order:
        q = _order_tree(q, order)
    q_ref[:] = q.astype(jnp.uint8)
    am_ref[:] = am


def _tiles_q4(N: int, K: int, blocksize: int):
    """One K-spanning tile per grid row-step: the absmax output's lane dim
    is then the full K/bs (Mosaic requires lane dims divisible by 128 or
    equal to the array dim).  TN adapts so the f32 tile stays ~<= 4 MB."""
    budget_rows = max(8, (2 << 20) // (K * 4))
    TN = next(
        (t for t in (512, 256, 128, 64, 32, 16, 8) if t <= budget_rows and N % t == 0),
        None,
    )
    return TN, K


def pallas_quant4bit_supported(N: int, K: int, blocksize: int) -> bool:
    if K % blocksize or K % 128:
        return False
    if K // blocksize > 512:  # unrolled per-block loop: bound compile size
        return False
    TN, TK = _tiles_q4(N, K, blocksize)
    return TN is not None and TK is not None


@functools.partial(jax.jit, static_argnames=("code_t", "blocksize"))
def quantize_4bit_codes_pallas(W, *, code_t, blocksize, stochastic_seed=None, stochastic_u=None):
    """W [N, K] -> (codes uint8 [N, K], absmax f32 [N, K/bs]); one HBM pass.

    ``stochastic_seed`` ([2] int32; TPU): distance-proportional stochastic
    rounding with uniforms from the on-core PRNG, drawn in the same VMEM
    pass.  ``stochastic_u`` (f32 [N, K]): uniforms supplied by the caller
    (interpret tier / oracle-exact tests)."""
    N, K = W.shape
    code = np.asarray(code_t, np.float32)
    order = np.argsort(code, kind="stable").astype(np.int32)
    sorted_code = code[order]
    midpoints = ((sorted_code[:-1] + sorted_code[1:]) * 0.5).astype(np.float32)
    identity_order = bool(np.array_equal(order, np.arange(16)))
    TN, TK = _tiles_q4(N, K, blocksize)
    nb = TK // blocksize
    if stochastic_seed is not None:
        mode = "seed"
        extra_args = [stochastic_seed.astype(jnp.int32)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    elif stochastic_u is not None:
        mode = "u"
        extra_args = [stochastic_u.reshape(N, K).astype(jnp.float32)]
        extra_specs = [
            pl.BlockSpec((TN, TK), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
    else:
        mode = None
        extra_args, extra_specs = [], []
    q, am = pl.pallas_call(
        functools.partial(
            _q4_kernel,
            midpoints=midpoints,
            order=order,
            blocksize=blocksize,
            identity_order=identity_order,
            sorted_code=sorted_code,
            stochastic=mode,
        ),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((TN, TK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + extra_specs,
        out_specs=[
            pl.BlockSpec((TN, TK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, nb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.uint8),
            jax.ShapeDtypeStruct((N, K // blocksize), jnp.float32),
        ],
        interpret=_interpret(),
    )(W, *extra_args)
    return q, am
