"""Probe (VERDICT r3 item 2): the MXU-assisted decode family for NF4.

Two remaining levers from the r2/r3 lists, measured in-kernel at the
Llama-3-8B decode shape ([4096, 4096], M=16, bs=64) against the shipped
pair-word select-tree kernel (`gemm_4bit_paired`), plus isolation
microbenches for the premises:

  D. **one-hot rider** (reference gemm_4bit_simt.cu:223-244 analog): per
     codebook value v, build bf16 0/1 mask rows from the packed bytes with
     2 compares + 2 selects + 1 or on int32 words (5 ops/byte/v = 40
     lane-ops per decoded element for all 16), stack the 16 masks along
     the sublane dim, and contract ONE [TM, bs] x [16*TN, bs] dot per
     quant block on the (idle at small M) MXU; apply code_v and the block
     absmax post-dot on [TM, TN] slices.  The select tree moves to the
     MXU, but the mask build alone is ~2.1x the full pair-word decode's
     lane-ops — it wins only if the masked build beats the tree per op.

  E. **int8-domain decode**: the same 0/1 masks in int8 (int16 packing
     word -> pltpu.bitcast row interleave) with A pre-quantized to int8,
     riding the double-rate int8 MXU per quant block; scales applied
     post-dot.  SPEED probe only — int8 A changes the accuracy class, so
     this could never ship as the default path; it bounds what the int8
     MXU could buy.  Premise microbench: does Mosaic pack int8 ALU 4x?
     (int16 was measured NOT packed in r3, probe_decode16.py.)

Every exact variant is checked against the jnp oracle before timing.
Timing: device_loop_time (hoist-proof marginal cost), interleaved with
the baseline inside one process, canary-free (ratios within-process).

MEASURED on the real v5e chip (2026-08-19, this file unmodified):

    rel-err vs oracle: baseline 3.13e-03  one-hot 5.04e-07
    rel-err vs oracle: int8-domain 8.42e-03 (int8-A accuracy class)
    baseline pair-word :     67.5 us/call  (n=3: [119.4, 64.9, 67.5])
    D one-hot rider    :    390.9 us/call  ratio 5.79x   -> REJECTED
    E int8-domain      :    244.7 us/call  ratio 3.63x   -> REJECTED
    int32 cmp+sel chain:     3.13 ps/byte
    int8  cmp+sel chain:  Mosaic REJECTS int8 vector ALU outright
        ("Only vector<i16> and vector<i32> are supported, but got 'i8'")
        — the 4x-packing premise of the int8-domain family is dead at
        the compiler level, not just unpacked like int16 (r3 finding).

With these two, every lever from the r2/r3 MXU-decode list is measured
and rejected (alongside r3's int16 mux 20.4, int32 bit-keyed 18.2,
bf16-select mux 20.3 vs pair-word 15.8 ps/byte): the select-tree decode
IS the lane-op floor on this Mosaic generation, and the ~0.22 small-M
%SoL plateau is a hardware/compiler property of NF4 decode, not a
kernel-design gap.  This axis is closed per VERDICT r3 item 2's
criterion.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
    _to_bf16_rows,
    gemm_4bit_paired,
    pack_npaired,
)
from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.utils.benchmark import device_loop_time

M, N, K, BS = 16, 4096, 4096, 64
TM, TN, TK = 16, 256, 512
CODE = tuple(float(x) for x in np.asarray(get_4bit_code("nf4", 64)).reshape(-1))
ONE_BF16 = 0x3F80  # bf16 1.0 bit pattern


def _interp() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


# ---------------------------------------------------------------------------
# D. one-hot rider kernel (exact)
# ---------------------------------------------------------------------------


def _mask_rows_bf16(hi, lo, v: int):
    """bf16 0/1 mask rows [2S, L] for codebook value v (row 2i = high
    nibble, 2i+1 = low — the pair-word row convention)."""
    wl = jnp.where(hi == v, jnp.int32(ONE_BF16), jnp.int32(0))
    wh = jnp.where(lo == v, jnp.int32(ONE_BF16 << 16), jnp.int32(0))
    return _to_bf16_rows(wl | wh)


def _onehot_kernel(a_ref, bp_ref, scale_ref, out_ref, *, code_t, blocksize):
    k = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)  # [TN/2, TK]
    hi = jax.lax.shift_right_logical(p, 4)
    lo = p & 15
    TN_ = 2 * p.shape[0]
    TK_ = p.shape[1]
    nb = TK_ // blocksize
    stk = jnp.concatenate(
        [_mask_rows_bf16(hi, lo, v) for v in range(16)], axis=0
    )  # [16*TN, TK] bf16 0/1
    a = a_ref[:]
    dims = (((1,), (1,)), ((), ()))
    acc = None
    for b in range(nb):
        sl = slice(b * blocksize, (b + 1) * blocksize)
        sub = jax.lax.dot_general(
            a[:, sl], stk[:, sl], dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [TM, 16*TN]
        comb = None
        for v in range(16):
            t = sub[:, v * TN_ : (v + 1) * TN_] * jnp.float32(code_t[v])
            comb = t if comb is None else comb + t
        term = comb * scale_ref[b : b + 1, :]
        acc = term if acc is None else acc + term

    @pl.when(k == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _accum():
        out_ref[:] += acc


def gemm_onehot(A, P, absmax_t):
    grid = (M // TM, N // TN, K // TK)
    return pl.pallas_call(
        functools.partial(_onehot_kernel, code_t=CODE, blocksize=BS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, i, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 2, TK), lambda m, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // BS, TN), lambda m, i, k: (k, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, i, k: (m, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interp(),
    )(A, P, absmax_t)


# ---------------------------------------------------------------------------
# E. int8-domain kernel (speed probe; accuracy class int8)
# ---------------------------------------------------------------------------


def _mask_rows_i8(hi, lo, v: int):
    """int8 0/1 mask rows [2S, L]: int16 packing word -> bitcast."""
    w = jnp.where(hi == v, jnp.int32(1), jnp.int32(0)) | jnp.where(
        lo == v, jnp.int32(256), jnp.int32(0)
    )
    w16 = w.astype(jnp.int16)
    if _interp():
        both = jax.lax.bitcast_convert_type(w16, jnp.int8)  # [S, L, 2]
        return jnp.swapaxes(both, 1, 2).reshape(2 * w16.shape[0], w16.shape[1])
    return pltpu.bitcast(w16, jnp.int8)


def _int8dom_kernel(a8_ref, bp_ref, scale_ref, out_ref, *, code_t, blocksize):
    k = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)
    hi = jax.lax.shift_right_logical(p, 4)
    lo = p & 15
    TN_ = 2 * p.shape[0]
    TK_ = p.shape[1]
    nb = TK_ // blocksize
    stk = jnp.concatenate(
        [_mask_rows_i8(hi, lo, v) for v in range(16)], axis=0
    )  # [16*TN, TK] int8 0/1
    a8 = a8_ref[:]
    dims = (((1,), (1,)), ((), ()))
    acc = None
    for b in range(nb):
        sl = slice(b * blocksize, (b + 1) * blocksize)
        sub = jax.lax.dot_general(
            a8[:, sl], stk[:, sl], dims,
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [TM, 16*TN] int32
        comb = None
        for v in range(16):
            t = sub[:, v * TN_ : (v + 1) * TN_].astype(jnp.float32) * jnp.float32(
                code_t[v]
            )
            comb = t if comb is None else comb + t
        term = comb * scale_ref[b : b + 1, :]
        acc = term if acc is None else acc + term

    @pl.when(k == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _accum():
        out_ref[:] += acc


def gemm_int8dom(A8, P, absmax_t):
    grid = (M // TM, N // TN, K // TK)
    return pl.pallas_call(
        functools.partial(_int8dom_kernel, code_t=CODE, blocksize=BS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, i, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 2, TK), lambda m, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // BS, TN), lambda m, i, k: (k, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, i, k: (m, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interp(),
    )(A8, P, absmax_t)


# ---------------------------------------------------------------------------
# isolation microbenches: int8 ALU packing + mask-build rate
# ---------------------------------------------------------------------------

REPS = 64
S_, L_ = 256, 1024


def k_time_int8_chain(x_ref, o_ref):
    """Raw int8 cmp+select chain rate: 4x the int32 rate iff Mosaic packs
    int8 ALU (the int8-domain premise)."""

    def body(i, acc):
        c = (acc & jnp.int8(1)) != 0
        return jnp.where(c, acc + jnp.int8(3), acc - jnp.int8(5))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_time_int32_chain(x_ref, o_ref):
    def body(i, acc):
        c = (acc & jnp.int32(1)) != 0
        return jnp.where(c, acc + jnp.int32(3), acc - jnp.int32(5))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_time_maskbuild(x_ref, o_ref):
    """The one-hot mask build alone (16 values x 5 int32 ops/byte)."""

    def body(i, acc):
        p = (acc ^ i) & 255
        hi = jax.lax.shift_right_logical(p, 4)
        lo = p & 15
        w = acc
        for v in range(16):
            wl = jnp.where(hi == v, jnp.int32(ONE_BF16), jnp.int32(0))
            wh = jnp.where(lo == v, jnp.int32(ONE_BF16 << 16), jnp.int32(0))
            w = w ^ (wl | wh)
        return w

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def time_chain(name, kernel, shape, dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-100, 100, size=shape), dtype)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )
    sec = device_loop_time(f, (x,), iters=30)
    per_byte = sec / REPS / (S_ * L_) * 1e12
    print(f"{name:26s}: {sec*1e6:8.1f} us  {per_byte:7.2f} ps/byte", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
    absmax = (rng.random((N, K // BS)) * 0.1 + 0.01).astype(np.float32)
    A_np = (rng.standard_normal((M, K)) * 0.5).astype(np.float32)

    P = jnp.asarray(pack_npaired(jnp.asarray(q)))
    absmax_t = jnp.asarray(absmax.T.copy())  # [K/BS, N]
    A = jnp.asarray(A_np, jnp.bfloat16)

    # oracle
    code_np = np.asarray(CODE, np.float32)
    W = code_np[q] * np.repeat(absmax, BS, axis=1)
    Y_ref = np.asarray(A, np.float32) @ W.T

    y_base = np.asarray(gemm_4bit_paired(A, P, absmax_t, CODE, BS, (N, K)))
    y_oh = np.asarray(gemm_onehot(A, P, absmax_t))
    err_base = np.abs(y_base - Y_ref).max() / (np.abs(Y_ref).max() + 1e-9)
    err_oh = np.abs(y_oh - Y_ref).max() / (np.abs(Y_ref).max() + 1e-9)
    print(f"rel-err vs oracle: baseline {err_base:.2e}  one-hot {err_oh:.2e}")
    assert err_oh < 5e-2, "one-hot rider result does not match the oracle"

    # int8-domain: quantize A per row (speed probe; note the accuracy class)
    a_sc = np.abs(A_np).max(axis=1, keepdims=True) / 127.0
    A8 = jnp.asarray(np.round(A_np / a_sc).astype(np.int8))
    y_i8 = np.asarray(gemm_int8dom(A8, P, absmax_t)) * a_sc
    err_i8 = np.abs(y_i8 - Y_ref).max() / (np.abs(Y_ref).max() + 1e-9)
    print(f"rel-err vs oracle: int8-domain {err_i8:.2e} (int8-A accuracy class)")

    # in-kernel timing, interleaved
    fb = lambda: device_loop_time(
        lambda A, P, s: gemm_4bit_paired(A, P, s, CODE, BS, (N, K)),
        (A, P, absmax_t), iters=30,
    )
    fo = lambda: device_loop_time(gemm_onehot, (A, P, absmax_t), iters=30)
    fi = lambda: device_loop_time(gemm_int8dom, (A8, P, absmax_t), iters=30)
    tb, to, ti = [], [], []
    for _ in range(3):
        tb.append(fb())
        to.append(fo())
        ti.append(fi())
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(f"baseline pair-word : {med(tb)*1e6:8.1f} us/call  (n=3: {[round(t*1e6,1) for t in tb]})")
    print(f"D one-hot rider    : {med(to)*1e6:8.1f} us/call  ratio {med(to)/med(tb):.2f}x")
    print(f"E int8-domain      : {med(ti)*1e6:8.1f} us/call  ratio {med(ti)/med(tb):.2f}x")

    # premise microbenches (int8 ALU is REJECTED by Mosaic on this stack —
    # keep probing it so a future Mosaic that accepts it gets noticed)
    for name, k, sh, dt in [
        ("int32 cmp+sel chain", k_time_int32_chain, (S_, L_), jnp.int32),
        ("one-hot mask build x16", k_time_maskbuild, (S_, L_), jnp.int32),
        ("int8 cmp+sel chain x4", k_time_int8_chain, (2 * S_, 2 * L_), jnp.int8),
    ]:
        try:
            time_chain(name, k, sh, dt)
        except Exception as e:
            print(f"{name:26s}: REJECTED — {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
