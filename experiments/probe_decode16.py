"""Probe: can the NF4 nibble->bf16-pattern decode run 2x-packed in int16?

Candidates vs the shipped int32 pair-word decode (~38 lane-ops/byte):

  A. int16 bit-keyed 16:1 mux: build the interleaved nibble-index array
     ni [2S, L] int16 via the (lo<<16|hi) int32 word + bitcast, then a
     4-level multiplexer keyed on the 4 SHARED index bits (4 conds + 15
     selects, all int16 = 2 elements/lane if Mosaic packs int16 ALU).
     ~23 packed ops + 4 int32 ops/byte => ~13.5 lane-ops/elem if packed.
  B. int32 bit-keyed pair-word mux: same mux idea at int32 granularity
     (shared bit conditions replace the 7+7 threshold compares);
     ~34 ops/byte => ~17/elem.  No Mosaic risk.

Each candidate is checked for EXACTNESS against the oracle (bf16 bit
patterns of the codebook) before timing.  Timing: decode REPS times with a
loop-carried xor dependency (no hoisting), marginal-cost per rep.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
import ml_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import _decode_pair_word
from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.utils.benchmark import device_loop_time

REPS = 64
S, L = 256, 1024  # payload tile [S, L] bytes -> decoded [2S, L]

CODE = tuple(float(x) for x in np.asarray(get_4bit_code("nf4", 64)).reshape(-1))


def _interp() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def bc_i32_to_i16(w):
    """int32 [S, L] -> int16 [2S, L]; low half -> row 2i (probed mapping)."""
    if _interp():
        both = jax.lax.bitcast_convert_type(w, jnp.int16)  # [S, L, 2]
        return jnp.swapaxes(both, 1, 2).reshape(2 * w.shape[0], w.shape[1])
    return pltpu.bitcast(w, jnp.int16)


def bc_i16_to_bf16(x):
    if _interp():
        return jax.lax.bitcast_convert_type(x, jnp.bfloat16)
    return pltpu.bitcast(x, jnp.bfloat16)


def bc_i16_to_i32(x):
    """int16 [2S, L] -> int32 [S, L] (inverse of bc_i32_to_i16)."""
    if _interp():
        S2, L_ = x.shape
        pairs = jnp.swapaxes(x.reshape(S2 // 2, 2, L_), 1, 2)  # [S, L, 2]
        return jax.lax.bitcast_convert_type(pairs, jnp.int32)
    return pltpu.bitcast(x, jnp.int32)


def bc_i32_to_bf16(w):
    if _interp():
        both = jax.lax.bitcast_convert_type(w, jnp.bfloat16)
        return jnp.swapaxes(both, 1, 2).reshape(2 * w.shape[0], w.shape[1])
    return pltpu.bitcast(w, jnp.bfloat16)


def _patterns16():
    """int16 (two's complement) bf16 bit patterns of the 16 codebook entries."""
    pats = (
        np.asarray(CODE, np.float32).astype(ml_dtypes.bfloat16).view(np.uint16)
    )
    return [int(x) - (1 << 16) if x >= (1 << 15) else int(x) for x in pats]


PAT16 = _patterns16()


def _build_ni(p):
    """p int32 [S, L] bytes -> int32 word (lo<<16 | hi); bitcast outside."""
    return ((p & 15) << 16) | jax.lax.shift_right_logical(p, 4)


def _mux16_int16(ni):
    """4-level bit-keyed mux over the 16 int16 patterns; ni int16 [2S, L]."""
    c0 = (ni & jnp.int16(1)) != 0
    c1 = (ni & jnp.int16(2)) != 0
    c2 = (ni & jnp.int16(4)) != 0
    c3 = (ni & jnp.int16(8)) != 0
    lvl = [
        jnp.where(c0, jnp.int16(PAT16[2 * v + 1]), jnp.int16(PAT16[2 * v]))
        for v in range(8)
    ]
    lvl = [jnp.where(c1, lvl[2 * v + 1], lvl[2 * v]) for v in range(4)]
    lvl = [jnp.where(c2, lvl[2 * v + 1], lvl[2 * v]) for v in range(2)]
    return jnp.where(c3, lvl[1], lvl[0])


def _pair_words_int32():
    pats = (
        np.asarray(CODE, np.float32).astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint64)
    )
    words = (pats[1::2] << 16) | pats[0::2]
    return [int(x) - (1 << 32) if x >= (1 << 31) else int(x) for x in words]


PW32 = _pair_words_int32()


def _mux8_words(idx3):
    """Bit-keyed mux over the 8 pair words; idx3 = 3-bit index (int32)."""
    c0 = (idx3 & 1) != 0
    c1 = (idx3 & 2) != 0
    c2 = (idx3 & 4) != 0
    lvl = [jnp.where(c0, jnp.int32(PW32[2 * v + 1]), jnp.int32(PW32[2 * v])) for v in range(4)]
    lvl = [jnp.where(c1, lvl[2 * v + 1], lvl[2 * v]) for v in range(2)]
    return jnp.where(c2, lvl[1], lvl[0])


def _decode_pair_word_mux(p):
    """int32 bit-keyed variant of _decode_pair_word: same output word."""
    wH = _mux8_words(jax.lax.shift_right_logical(p, 5))
    h = jax.lax.shift_right_logical(wH, p & 16) & 0xFFFF
    ql = p & 15
    wL = _mux8_words(jax.lax.shift_right_logical(ql, 1))
    amt = ((ql & 1) ^ 1) << 4
    l = jax.lax.shift_left(wL, amt) & jnp.int32(-65536)
    return h | l


# -- correctness kernels (one decode pass, output the decoded patterns) -----


def k_decode_A(x_ref, o_ref):
    ni = bc_i32_to_i16(_build_ni(x_ref[:]))  # [2S, L]
    o_ref[:] = bc_i16_to_bf16(_mux16_int16(ni))


def k_decode_B(x_ref, o_ref):
    o_ref[:] = bc_i32_to_bf16(_decode_pair_word_mux(x_ref[:]))


def k_decode_cur(x_ref, o_ref):
    o_ref[:] = bc_i32_to_bf16(_decode_pair_word(x_ref[:], CODE))


# -- timing kernels (REPS decodes with xor dependency) ----------------------


def k_time_A(x_ref, o_ref):
    def body(i, acc):
        p = (acc ^ i) & 255
        ni = bc_i32_to_i16(_build_ni(p))
        pat = _mux16_int16(ni)
        w = bc_i16_to_i32(pat)  # back to [S, L] int32
        return acc ^ w

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_time_B(x_ref, o_ref):
    def body(i, acc):
        p = (acc ^ i) & 255
        return acc ^ _decode_pair_word_mux(p)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_time_cur(x_ref, o_ref):
    def body(i, acc):
        p = (acc ^ i) & 255
        return acc ^ _decode_pair_word(p, CODE)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_time_int16_chain(x_ref, o_ref):
    """Raw int16 and+cmp+select chain rate (4 packed ops/rep over [2S, L])."""
    def body(i, acc):
        c = (acc & jnp.int16(1)) != 0
        return jnp.where(c, acc + jnp.int16(3), acc - jnp.int16(5))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


# -- candidate C: int16 bit conds + selects over bf16 VALUES ----------------
# Insurance for "Mosaic packs bf16 selects but not int16 selects": the 15
# selects run on native-packed bf16 lanes; only the 4 bit tests stay int16.
# If the int16-derived bool mask needs a relayout to gate bf16 lanes, the
# bf16-chain microbench below will show it.

def _mux16_bf16(ni):
    c0 = (ni & jnp.int16(1)) != 0
    c1 = (ni & jnp.int16(2)) != 0
    c2 = (ni & jnp.int16(4)) != 0
    c3 = (ni & jnp.int16(8)) != 0
    cb = [jnp.bfloat16(v) for v in CODE]
    lvl = [jnp.where(c0, cb[2 * v + 1], cb[2 * v]) for v in range(8)]
    lvl = [jnp.where(c1, lvl[2 * v + 1], lvl[2 * v]) for v in range(4)]
    lvl = [jnp.where(c2, lvl[2 * v + 1], lvl[2 * v]) for v in range(2)]
    return jnp.where(c3, lvl[1], lvl[0])


def bc_bf16_to_i16(x):
    if _interp():
        return jax.lax.bitcast_convert_type(x, jnp.int16)
    return pltpu.bitcast(x, jnp.int16)


def k_decode_C(x_ref, o_ref):
    ni = bc_i32_to_i16(_build_ni(x_ref[:]))
    o_ref[:] = _mux16_bf16(ni)


def k_time_C(x_ref, o_ref):
    def body(i, acc):
        p = (acc ^ i) & 255
        ni = bc_i32_to_i16(_build_ni(p))
        vals = _mux16_bf16(ni)
        return acc ^ bc_i16_to_i32(bc_bf16_to_i16(vals))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def k_time_bf16_sel_chain(x_ref, o_ref):
    """bf16 select gated by an int16-derived cond: measures whether the
    cross-dtype mask costs a relayout (int16 cmp -> bf16 lanes)."""
    def body(i, acc):
        c = (bc_bf16_to_i16(acc) & jnp.int16(1)) != 0
        return jnp.where(c, acc + jnp.bfloat16(0.5), acc - jnp.bfloat16(0.25))

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def check(name, kernel):
    rng = np.random.default_rng(0)
    pb = rng.integers(0, 256, size=(S, L), dtype=np.uint8)
    x = jnp.asarray(pb, jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * S, L), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )(x)
    got = np.asarray(out).view(np.uint16)
    pats = np.asarray(
        np.asarray(CODE, np.float32).astype(ml_dtypes.bfloat16).view(np.uint16)
    )
    want = np.empty((2 * S, L), np.uint16)
    want[0::2] = pats[pb >> 4]
    want[1::2] = pats[pb & 15]
    ok = np.array_equal(got, want)
    print(f"{name}: exact={ok}" + ("" if ok else f"  mismatches={np.mean(got != want):.3f}"))
    return ok


def time_one(name, kernel, shape=(S, L), dtype=jnp.int32, ops_per_byte=None):
    rng = np.random.default_rng(1)
    if dtype == jnp.int32:
        x = jnp.asarray(rng.integers(0, 256, size=shape), jnp.int32)
    else:
        x = jnp.asarray(rng.integers(-100, 100, size=shape), dtype)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )
    sec = device_loop_time(f, (x,), iters=30)
    nbytes = S * L  # decoded elements = 2*S*L
    per_byte = sec / REPS / nbytes * 1e12  # ps/byte
    print(f"{name:26s}: {sec*1e6:8.1f} us  {per_byte:7.2f} ps/byte", flush=True)


def main():
    print("backend:", jax.default_backend())
    ok = True
    for name, k in [
        ("cur(pair-word)", k_decode_cur),
        ("A(int16 mux)", k_decode_A),
        ("B(int32 mux)", k_decode_B),
        ("C(bf16 sel mux)", k_decode_C),
    ]:
        try:
            ok &= check(name, k)
        except Exception as e:
            print(f"{name} check FAILED: {str(e)[:200]}")
            ok = False
    for name, k, sh, dt in [
        ("time cur(pair-word)", k_time_cur, (S, L), jnp.int32),
        ("time B(int32 mux)", k_time_B, (S, L), jnp.int32),
        ("time A(int16 mux)", k_time_A, (S, L), jnp.int32),
        ("time int16 chain x4", k_time_int16_chain, (2 * S, L), jnp.int16),
        ("time C(bf16 sel mux)", k_time_C, (S, L), jnp.int32),
        ("time bf16 sel chain", k_time_bf16_sel_chain, (2 * S, L), jnp.bfloat16),
    ]:
        try:
            time_one(name, k, sh, dt)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
