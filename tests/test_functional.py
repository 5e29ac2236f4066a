"""Quantize/dequantize roundtrip + int8 op tests.

Mirrors the reference test strategy (tests/test_functional.py): statistical
error thresholds per format, roundtrip idempotence, exactness cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bitsandbytes_tpu.functional as F


@pytest.mark.parametrize("blocksize", [64, 256, 4096])
@pytest.mark.parametrize("nested", [False, True])
def test_blockwise_8bit_roundtrip(blocksize, nested):
    x = jnp.asarray(np.random.randn(31, 257).astype(np.float32))
    q, state = F.quantize_blockwise(x, blocksize=blocksize, nested=nested)
    assert q.shape == x.shape and q.dtype == jnp.uint8
    out = F.dequantize_blockwise(q, state)
    err = jnp.abs(out - x).mean()
    # dynamic 8-bit: ~2 decimal digits relative precision (reference
    # test_functional.py dynamic quant thresholds ~0.0135 absolute on N(0,1))
    assert err < 0.02 if not nested else err < 0.025
    # idempotence: quantizing the dequantized value returns the same codes
    q2, _ = F.quantize_blockwise(out, blocksize=blocksize, nested=nested)
    assert (np.asarray(q2) == np.asarray(q)).mean() > 0.999


def test_blockwise_exact_codepoints():
    code = jnp.asarray(F.create_dynamic_map())
    # values exactly on codebook entries times absmax quantize losslessly
    absmax = 3.7
    x = code[None, :] * absmax
    q, state = F.quantize_blockwise(x, blocksize=256)
    out = F.dequantize_blockwise(q, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("blocksize", [64, 128])
@pytest.mark.parametrize("compress_statistics", [False, True])
def test_4bit_roundtrip(quant_type, blocksize, compress_statistics):
    W = jnp.asarray(np.random.randn(128, 256).astype(np.float32))
    packed, state = F.quantize_4bit(
        W, blocksize=blocksize, quant_type=quant_type, compress_statistics=compress_statistics
    )
    assert packed.shape == (W.size // 2, 1) and packed.dtype == jnp.uint8
    out = F.dequantize_4bit(packed, quant_state=state)
    assert out.shape == W.shape
    err = jnp.abs(out - W).mean()
    # reference thresholds: nf4 ~0.07-0.1 abs error on N(0,1) data
    limit = {"nf4": 0.12, "fp4": 0.16}[quant_type]
    assert err < limit, err
    # roundtrip stability
    packed2, state2 = F.quantize_4bit(out, blocksize=blocksize, quant_type=quant_type)
    assert (np.asarray(packed2) == np.asarray(packed)).mean() > 0.99


def test_4bit_codepoint_exact():
    code = jnp.asarray(F.get_4bit_code("nf4"))
    x = jnp.tile(code, (4, 4))  # 4x64: each row = 4 blocks of the exact codebook
    packed, state = F.quantize_4bit(x, blocksize=64, quant_type="nf4")
    out = F.dequantize_4bit(packed, quant_state=state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6, atol=1e-7)


def test_4bit_odd_sizes():
    x = jnp.asarray(np.random.randn(7, 9).astype(np.float32))  # 63 elements
    packed, state = F.quantize_4bit(x, blocksize=64)
    assert packed.shape == ((63 + 1) // 2, 1)
    out = F.dequantize_4bit(packed, quant_state=state)
    assert out.shape == x.shape
    assert jnp.abs(out - x).mean() < 0.15


def test_4bit_pack_order():
    """High nibble first: packed = (q[2j] << 4) | q[2j+1] (kernels.cu:357)."""
    q = jnp.asarray([1, 2, 3, 4], dtype=jnp.uint8)
    packed = F.pack_4bit(q)
    np.testing.assert_array_equal(np.asarray(packed), [0x12, 0x34])
    np.testing.assert_array_equal(np.asarray(F.unpack_4bit(packed)), [1, 2, 3, 4])


def test_4bit_quant_storage():
    W = jnp.asarray(np.random.randn(64, 64).astype(np.float32))
    p8, s8 = F.quantize_4bit(W, quant_storage=jnp.uint8)
    # float storage dtypes alias to same-width unsigned ints (NaN-safe)
    p16, s16 = F.quantize_4bit(W, quant_storage=jnp.bfloat16)
    assert p16.dtype == jnp.uint16 and p16.size == p8.size // 2
    out = F.dequantize_4bit(p16, quant_state=s16)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(F.dequantize_4bit(p8, quant_state=s8))
    )


def test_quant_state_serialization_roundtrip():
    W = jnp.asarray(np.random.randn(32, 128).astype(np.float32))
    for packed_fmt in (False, True):
        packed, state = F.quantize_4bit(W, compress_statistics=True)
        d = state.as_dict(packed=packed_fmt)
        state2 = F.QuantState.from_dict(d)
        out1 = F.dequantize_4bit(packed, quant_state=state)
        out2 = F.dequantize_4bit(packed, quant_state=state2)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert state2.blocksize == state.blocksize
        assert state2.quant_type == state.quant_type
        assert tuple(state2.shape) == tuple(state.shape)


def test_quant_state_is_pytree():
    W = jnp.asarray(np.random.randn(32, 64).astype(np.float32))
    packed, state = F.quantize_4bit(W, compress_statistics=True)

    @jax.jit
    def dq(packed, state):
        return F.dequantize_4bit(packed, quant_state=state)

    out = dq(packed, state)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(F.dequantize_4bit(packed, quant_state=state)), atol=1e-6
    )


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------


def test_int8_vectorwise_quant_roundtrip():
    A = jnp.asarray(np.random.randn(48, 128).astype(np.float32))
    q, stats, outliers = F.int8_vectorwise_quant(A)
    assert outliers is None
    assert q.dtype == jnp.int8
    out = F.int8_vectorwise_dequant(q, stats)
    assert jnp.abs(out - A).max() < stats.max() / 127.0


def test_int8_vectorwise_quant_threshold():
    A = np.random.randn(16, 64).astype(np.float32)
    A[3, 10] = 50.0
    A[7, 20] = -42.0
    q, stats, mask = F.int8_vectorwise_quant(jnp.asarray(A), threshold=6.0)
    mask = np.asarray(mask)
    assert mask[10] and mask[20] and mask.sum() == 2
    # outlier columns zeroed in the int8 output
    qn = np.asarray(q)
    assert (qn[:, 10] == 0).all() and (qn[:, 20] == 0).all()
    # row stats exclude outliers
    assert np.asarray(stats)[3] < 10.0


def test_int8_linear_matmul_matches_fp():
    A = np.random.randint(-127, 128, (8, 32)).astype(np.int8)
    B = np.random.randint(-127, 128, (16, 32)).astype(np.int8)
    out = F.int8_linear_matmul(jnp.asarray(A), jnp.asarray(B))
    ref = A.astype(np.int32) @ B.astype(np.int32).T
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_int8_scaled_mm_accuracy():
    A = np.random.randn(16, 64).astype(np.float32)
    B = np.random.randn(32, 64).astype(np.float32)
    qa, sa, _ = F.int8_vectorwise_quant(jnp.asarray(A))
    qb, sb, _ = F.int8_vectorwise_quant(jnp.asarray(B))
    out = F.int8_scaled_mm(qa, qb, sa, sb, dtype=jnp.float32)
    ref = A @ B.T
    rel = np.abs(np.asarray(out) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.015, rel


def test_int8_mixed_scaled_mm_outliers():
    """With outlier decomposition ON, large-magnitude columns don't destroy
    accuracy (the LLM.int8() premise)."""
    rng = np.random.RandomState(1)
    A = rng.randn(16, 64).astype(np.float32)
    A[:, 5] *= 30.0  # systematic outlier column
    B = rng.randn(32, 64).astype(np.float32)
    ref = A @ B.T

    qa, sa, mask = F.int8_vectorwise_quant(jnp.asarray(A), threshold=6.0)
    qb, sb, _ = F.int8_vectorwise_quant(jnp.asarray(B))
    out = F.int8_mixed_scaled_mm(
        qa, jnp.asarray(A), qb, sa, sb, outlier_cols=mask, dtype=jnp.float32
    )
    rel = np.abs(np.asarray(out) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel

    # without decomposition the same data is much worse
    qa2, sa2, _ = F.int8_vectorwise_quant(jnp.asarray(A))
    out2 = F.int8_scaled_mm(qa2, qb, sa2, sb, dtype=jnp.float32)
    rel2 = np.abs(np.asarray(out2) - ref).mean() / np.abs(ref).mean()
    assert rel2 > rel * 2


def test_int8_double_quant():
    A = np.random.randn(16, 64).astype(np.float32)
    out_row, out_col, row_stats, col_stats, _ = F.int8_double_quant(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(row_stats), np.abs(A).max(1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(col_stats), np.abs(A).max(0), rtol=1e-6)
    ref_row = np.round(A * (127.0 / np.abs(A).max(1, keepdims=True)))
    np.testing.assert_allclose(np.asarray(out_row), ref_row, atol=1)


# ---------------------------------------------------------------------------
# gemm_4bit (reference-tier path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("M", [1, 8])
def test_gemm_4bit_matches_dequant_matmul(quant_type, M):
    K, N = 256, 128
    A = jnp.asarray(np.random.randn(M, K).astype(np.float32))
    W = jnp.asarray(np.random.randn(N, K).astype(np.float32))
    packed, state = F.quantize_4bit(W, quant_type=quant_type)
    out = F.gemm_4bit(A, packed, state)
    W_dq = F.dequantize_4bit(packed, quant_state=state)
    ref = A @ W_dq.T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gemm_4bit_nested_absmax():
    K, N = 512, 64
    A = jnp.asarray(np.random.randn(2, K).astype(np.float32))
    W = jnp.asarray(np.random.randn(N, K).astype(np.float32))
    packed, state = F.quantize_4bit(W, compress_statistics=True)
    out = F.gemm_4bit(A, packed, state)
    ref = A @ F.dequantize_4bit(packed, quant_state=state).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_nested_absmax_dequant_routes_to_segment_decode_under_jit(monkeypatch):
    """dequant_absmax must use the segment-arithmetic decode for the
    canonical dynamic map BOTH eagerly and when the QuantState flows
    through jit as a traced pytree (jnp.asarray lifts constant code tables
    to tracers at trace time — before round 3, a concreteness check
    silently dropped jitted NF4+DQ decode onto XLA's 256-entry gather
    lowering, 27x plain NF4).  The segment decode is also what the fused
    gemm kernel's in-kernel nested decode runs
    (ops/pallas/gemm4bit_paired._decode_scale_tile), so this route keeps
    the two tiers bit-identical."""
    import bitsandbytes_tpu.functional.dynamic_segments as DS

    calls = []
    orig = DS.segment_decode_sym

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    # quant_state imports at call time from the module, so patching the
    # module attribute intercepts both eager and traced calls
    monkeypatch.setattr(DS, "segment_decode_sym", spy)

    W = jnp.asarray(np.random.randn(64, 2048).astype(np.float32))
    packed, state = F.quantize_4bit(W, compress_statistics=True)
    ref = np.asarray(state.dequant_absmax())  # eager (concrete code leaf)
    assert calls, "eager nested dequant did not use the segment decode"
    calls.clear()
    out = np.asarray(jax.jit(lambda s: s.dequant_absmax())(state))
    assert calls, "traced nested dequant fell off the segment-decode route"
    # jit may contract absmax*scale + offset into an FMA (one f32 rounding
    # fewer than eager) — equality holds to 1 ulp, not bit-exactly
    np.testing.assert_allclose(out, ref, rtol=3e-7, atol=0)
    # vs the exact table-gather reconstruction (reference default backend
    # semantics): the segment form is within ~2 ulp per entry
    from bitsandbytes_tpu.functional.blockwise import dequantize_blockwise_with_code

    exact = np.asarray(
        dequantize_blockwise_with_code(
            state.absmax, state.state2.absmax, state.state2.code, 256, jnp.float32
        ).reshape(-1)
        + state.offset
    )
    np.testing.assert_allclose(ref, exact, rtol=5e-7, atol=0)


def test_resolve_nested_bit_identical():
    """QuantState.resolve_nested materializes the DQ absmax once: the
    resolved (non-nested) state dequantizes and matmuls BIT-identically to
    the nested state, and serializes as the plain non-nested format."""
    W = jnp.asarray(np.random.randn(64, 512).astype(np.float32))
    for layout in ("2d", "paired"):
        packed, st = F.quantize_4bit(
            W, compress_statistics=True, blocksize=64, layout=layout
        )
        rs = st.resolve_nested()
        assert not rs.nested and rs.layout == layout
        np.testing.assert_array_equal(
            np.asarray(F.dequantize_4bit(packed, quant_state=st)),
            np.asarray(F.dequantize_4bit(packed, quant_state=rs)),
        )
        A = jnp.asarray(np.random.randn(4, 512).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(F.gemm_4bit(A, packed, st)),
            np.asarray(F.gemm_4bit(A, packed, rs)),
        )
        assert "nested_absmax" not in rs.as_dict()
    # QuantizedTensor wrapper
    from bitsandbytes_tpu.nn import QuantizedTensor

    qt = QuantizedTensor.quantize(W, compress_statistics=True)
    rqt = qt.resolve_nested()
    np.testing.assert_array_equal(
        np.asarray(qt.dequantize()), np.asarray(rqt.dequantize())
    )


def test_mid_m_crossover_table(monkeypatch):
    """Route selection (VERDICT r2 item 9): the per-shape crossover table
    decides fused vs dequant+MXU; BNB_LARGE_M overrides everything."""
    from bitsandbytes_tpu.functional import gemm as G

    # swept shapes use the measured crossover
    assert G._large_m_crossover(6144, 4096) == 128
    assert G._large_m_crossover(28672, 4096) == 256
    assert G._large_m_crossover(4096, 14336) == 384
    # unswept shapes fall back to the global threshold
    assert G._large_m_crossover(1234, 5678) == G.LARGE_M_THRESHOLD
    # env knob wins
    monkeypatch.setenv("BNB_LARGE_M", "64")
    assert G._large_m_crossover(6144, 4096) == 64


def test_stochastic_rounding_unbiased():
    """Stochastic quantization is unbiased: averaging dequantized values over
    many keys converges to the input (reference STOCHASTIC template,
    kernels.cu:269-375)."""
    from bitsandbytes_tpu.functional.blockwise import (
        dequantize_blockwise,
        quantize_blockwise,
    )

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4096,)).astype(np.float32))
    acc = np.zeros_like(np.asarray(x))
    reps = 32
    for i in range(reps):
        q, st = quantize_blockwise(x, blocksize=256, stochastic_key=jax.random.PRNGKey(i))
        acc += np.asarray(dequantize_blockwise(q, quant_state=st))
    mean_sto = acc / reps
    q0, st0 = quantize_blockwise(x, blocksize=256)
    det = np.asarray(dequantize_blockwise(q0, quant_state=st0))
    err_sto = np.abs(mean_sto - np.asarray(x)).mean()
    err_det = np.abs(det - np.asarray(x)).mean()
    # averaged stochastic error beats deterministic rounding's bias
    assert err_sto < err_det, (err_sto, err_det)


def test_stochastic_rounding_converges_where_rtn_stalls():
    """The classic use-case for the reference's STOCHASTIC kernel template
    (kernels.cu:269-375, per the 8-bit optimizers paper arXiv:2110.02861):
    when a parameter lives in a low-bit quantized store and every update is
    smaller than half the quantization gap, round-to-nearest requantization
    discards ALL progress (the trajectory stalls at its start), while
    stochastic rounding moves with the right probability and the trajectory
    converges in expectation.

    End-to-end form: gradient descent on f(w) = 0.5*||w - t||^2 with w kept
    in 8-bit blockwise codes (dequant -> step -> requant each iteration).
    lr is chosen so |lr * grad| is always below half the local code gap.
    The absmax element of every block is PINNED at its target (zero
    gradient) so the blockwise scale — and with it the quantization grid —
    stays frozen; otherwise the drifting absmax rescales the grid every
    step and acts as unintended dither that lets RTN creep forward.
    """
    from bitsandbytes_tpu.functional.blockwise import (
        dequantize_blockwise,
        quantize_blockwise,
    )

    rng = np.random.default_rng(7)
    n, bs, lr, steps = 1024, 256, 0.01, 400
    target = rng.uniform(0.2, 0.6, size=(n,)).astype(np.float32)
    w0 = target + 0.3  # top-decade gap at absmax 1.0 is ~0.014 >> 2*lr*|w-t|
    target[::bs] = 1.0  # pinned block absmax: w0 == target -> grad 0
    w0[::bs] = 1.0
    target = jnp.asarray(target)
    w0 = jnp.asarray(w0)

    def run(stochastic: bool):
        w = w0
        for i in range(steps):
            g = w - target
            key = jax.random.PRNGKey(i) if stochastic else None
            q, st = quantize_blockwise(w - lr * g, blocksize=bs, stochastic_key=key)
            w = dequantize_blockwise(q, quant_state=st)
        return float(jnp.mean(jnp.abs(w - target)))

    err_rtn = run(False)
    err_sto = run(True)
    # RTN: every step's update rounds back to the same code — full stall
    assert err_rtn > 0.25, err_rtn
    # SR: converges toward the target (contraction + unbiased requant);
    # residual is requant noise, far below the stall plateau
    assert err_sto < 0.08, err_sto
    assert err_sto < err_rtn / 3.0, (err_sto, err_rtn)


@pytest.mark.parametrize("storage", ["uint8", "uint16", "uint32", "bfloat16", "float32"])
def test_quant_storage_dtypes(storage):
    """quant_storage lets packed payloads masquerade as wider dtypes
    (reference nn/modules.py:545 — the FSDP flat-param trick; float
    storages alias to same-width unsigned ints here to avoid NaN
    canonicalization corrupting payload bits)."""
    from bitsandbytes_tpu.functional.fourbit import (
        QUANT_STORAGE_BITS,
        _STORAGE_ALIAS,
        dequantize_4bit,
        quantize_4bit,
    )

    W = jnp.asarray(np.random.default_rng(0).normal(size=(64, 128)).astype(np.float32))
    p8, qs8 = quantize_4bit(W, blocksize=64, quant_type="nf4")
    packed, qs = quantize_4bit(
        W, blocksize=64, quant_type="nf4", quant_storage=getattr(jnp, storage)
    )
    alias = _STORAGE_ALIAS.get(jnp.dtype(getattr(jnp, storage)), jnp.dtype(getattr(jnp, storage)))
    assert packed.dtype == alias
    elems = QUANT_STORAGE_BITS[jnp.dtype(alias)] // 8
    assert packed.size * elems == p8.size
    out = dequantize_4bit(packed, quant_state=qs)
    ref = dequantize_4bit(p8, quant_state=qs8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quant4bit_kernel_matches_oracle():
    """The Pallas 4-bit quantize kernel (absmax + compare-rank in one VMEM
    pass) must be bit-identical to the jnp oracle for every supported
    codebook (reference kQuantizeBlockwise, kernels.cu:269-463)."""
    from bitsandbytes_tpu.functional.fourbit import _quantize_4bit_impl, _quantize_tables
    from bitsandbytes_tpu.functional.codebooks import get_4bit_code
    from bitsandbytes_tpu.ops.pallas.quant4bit import (
        pallas_quant4bit_supported,
        quantize_4bit_codes_pallas,
    )

    rng = np.random.default_rng(0)
    for quant_type in ("nf4", "fp4", "int4"):
        for (N, K, bs) in ((64, 512, 64), (32, 1024, 128)):
            assert pallas_quant4bit_supported(N, K, bs)
            W = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
            code_t = tuple(float(x) for x in get_4bit_code(quant_type, bs))
            codes, am = quantize_4bit_codes_pallas(W, code_t=code_t, blocksize=bs)
            mid, order = _quantize_tables(quant_type, bs)
            packed_ref, am_ref = _quantize_4bit_impl(W, mid, order, bs, quant_type, "flat")
            # oracle packs adjacent pairs; unpack for code-level comparison
            pr = np.asarray(packed_ref).reshape(-1)
            ref_codes = np.stack([pr >> 4, pr & 0xF], -1).reshape(N, K)
            np.testing.assert_array_equal(np.asarray(codes), ref_codes)
            np.testing.assert_array_equal(
                np.asarray(am).reshape(-1), np.asarray(am_ref)
            )


def test_quantize_4bit_kernel_dispatch_identical():
    """quantize_4bit through the kernel dispatch == forced jnp tier."""
    import bitsandbytes_tpu.ops.dispatch as dispatch
    from bitsandbytes_tpu.functional.fourbit import quantize_4bit

    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32))
    for layout in ("2d", "paired", "flat"):
        p1, s1 = quantize_4bit(W, blocksize=64, layout=layout)
        old = dispatch._backend
        dispatch.set_backend("reference")
        try:
            p2, s2 = quantize_4bit(W, blocksize=64, layout=layout)
        finally:
            dispatch._backend = old
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(
            np.asarray(s1.dequant_absmax()), np.asarray(s2.dequant_absmax())
        )


def test_blockwise8_quantize_kernel_in_loop():
    """Regression for the round-1 TPU-worker fault: the single-pass
    blockwise-8bit quantize kernel (multi-output, [TB, 1] absmax) must
    survive being called inside a fori_loop (PARITY r1 known-gap #3)."""
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
    from bitsandbytes_tpu.ops.pallas.blockwise8 import quantize_blockwise_pallas

    code_t = tuple(float(x) for x in np.asarray(create_dynamic_map(True)))
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(8 * 256).astype(np.float32)
    )

    @jax.jit
    def loop(x):
        def body(i, c):
            q, am = quantize_blockwise_pallas(c, code_t=code_t, blocksize=256)
            return c + 0.0 * (q.astype(jnp.float32).mean() + am.mean())
        return jax.lax.fori_loop(0, 4, body, x)[0]

    v = float(loop(x))
    assert np.isfinite(v)


def test_stochastic_pallas_kernel_bit_identical_to_oracle():
    """The Pallas quantize kernels' stochastic mode (uniforms supplied, the
    interpret-tier route) is BIT-identical to the jnp oracle's
    _stochastic_requant with the same PRNG key — the move logic itself is
    tier-independent; only the uniform SOURCE differs on TPU (on-core
    pltpu.prng_random_bits, VERDICT r3 item 10 / reference STOCHASTIC
    template kernels.cu:269-375)."""
    from bitsandbytes_tpu.functional.blockwise import quantize_blockwise
    from bitsandbytes_tpu.functional.fourbit import quantize_4bit
    from bitsandbytes_tpu.ops import dispatch

    x = jax.random.normal(jax.random.PRNGKey(3), (16 * 256,), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(1), (64, 256), jnp.float32)
    key = jax.random.PRNGKey(9)
    old = dispatch.backend()
    try:
        dispatch.set_backend("reference")
        q_ref, st_ref = quantize_blockwise(x, blocksize=256, stochastic_key=key)
        p4_ref, _ = quantize_4bit(W, blocksize=64, layout="2d", stochastic_key=key)
        f4_ref, _ = quantize_4bit(
            W, blocksize=64, quant_type="fp4", layout="2d", stochastic_key=key
        )
        dispatch.set_backend("pallas")
        q_pal, st_pal = quantize_blockwise(x, blocksize=256, stochastic_key=key)
        p4_pal, _ = quantize_4bit(W, blocksize=64, layout="2d", stochastic_key=key)
        f4_pal, _ = quantize_4bit(
            W, blocksize=64, quant_type="fp4", layout="2d", stochastic_key=key
        )
    finally:
        dispatch.set_backend(old)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    np.testing.assert_array_equal(np.asarray(st_ref.absmax), np.asarray(st_pal.absmax))
    if not on_tpu:
        # interpret tier consumes the SUPPLIED uniforms -> bit-identical
        np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(q_pal))
        np.testing.assert_array_equal(np.asarray(p4_ref), np.asarray(p4_pal))
        np.testing.assert_array_equal(np.asarray(f4_ref), np.asarray(f4_pal))
    else:
        # real Mosaic draws on-core pltpu.prng_random_bits (a different
        # stream than the supplied key), so bit-identity cannot hold; the
        # SR contract is that every code is one of the two RANK-adjacent
        # codes of the oracle's draw (same bracketing pair around the
        # value).  Blockwise-8 codes are ranks directly.
        d8 = np.abs(
            np.asarray(q_pal, np.int16) - np.asarray(q_ref, np.int16)
        )
        assert d8.max() <= 1, d8.max()
        # 4-bit payloads are pair-packed (and fp4 is rank->bit-pattern
        # mapped), so compare in DEQUANTIZED space: both tiers' outputs
        # must bracket within one adjacent-code step of each other
        from bitsandbytes_tpu.functional.codebooks import get_4bit_code

        for ref_p, pal_p, qt in ((p4_ref, p4_pal, "nf4"), (f4_ref, f4_pal, "fp4")):
            code = np.sort(np.asarray(get_4bit_code(qt, 64), np.float64))
            max_gap = np.diff(code).max()
            _, st = quantize_4bit(W, blocksize=64, quant_type=qt, layout="2d")
            am = np.repeat(
                np.abs(np.asarray(W, np.float64)).reshape(-1, 64).max(axis=1), 64
            )
            from bitsandbytes_tpu.functional.fourbit import dequantize_4bit

            dr = np.asarray(dequantize_4bit(ref_p, st), np.float64).reshape(-1)
            dp = np.asarray(dequantize_4bit(pal_p, st), np.float64).reshape(-1)
            # each tier's draw lands within ONE adjacent-code gap of the
            # true value, so two independent draws are at most TWO gaps
            # apart (bracket-boundary ties pick different pairs)
            assert (np.abs(dr - dp) <= 2 * max_gap * am + 1e-12).all()
    # and the stochastic draw actually moved a healthy fraction of codes
    q_det, _ = quantize_blockwise(x, blocksize=256)
    moved = (np.asarray(q_pal) != np.asarray(q_det)).mean()
    assert 0.05 < moved < 0.5, moved


def test_stochastic_4bit_unbiased():
    """Averaged stochastic 4-bit quantization approaches the true values
    (unbiasedness), and beats deterministic rounding's bias (fp4 codebook
    exercises the rank->bit-pattern order map under the stochastic move)."""
    from bitsandbytes_tpu.functional.fourbit import dequantize_4bit, quantize_4bit

    xs = jax.random.uniform(jax.random.PRNGKey(5), (64, 64), jnp.float32) * 0.5 + 0.1
    det_p, det_s = quantize_4bit(xs, blocksize=64, quant_type="fp4")
    det = np.asarray(dequantize_4bit(det_p, det_s))
    acc = np.zeros_like(np.asarray(xs))
    R = 48
    for i in range(R):
        p_i, s_i = quantize_4bit(
            xs, blocksize=64, quant_type="fp4",
            stochastic_key=jax.random.PRNGKey(100 + i),
        )
        acc += np.asarray(dequantize_4bit(p_i, s_i))
    acc /= R
    x_np = np.asarray(xs)
    assert abs(acc - x_np).mean() < 0.5 * abs(det - x_np).mean()
