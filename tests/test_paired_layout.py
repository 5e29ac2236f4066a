"""N-paired payload layout + fused decode kernel (ops/pallas/gemm4bit_paired).

The paired layout packs weight rows (2i, 2i+1) into one byte per column and
stores absmax transposed [K/bs, N]; the kernel decodes both nibbles into one
int32 lane as packed bf16 patterns and sublane-bitcasts them to rows.  These
tests pin the layout round trips, the kernel-vs-oracle numerics (both scale
modes and both orientations), and the dispatch/serialization integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bitsandbytes_tpu as bnb
import bitsandbytes_tpu.functional as F
from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.nn.modules import QuantizedTensor
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
    gemm_4bit_paired,
    gemm_4bit_paired_nt,
    pack_npaired,
    repack_2d_to_npaired,
    repack_npaired_to_2d,
    unpack_npaired,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(64, 128), dtype=np.uint8)
    P = pack_npaired(jnp.asarray(q))
    assert P.shape == (32, 128)
    np.testing.assert_array_equal(np.asarray(unpack_npaired(P)), q)
    # relayout from/to the K-adjacent interop byte order
    pairs = q.reshape(64, 64, 2)
    p2d = jnp.asarray((pairs[..., 0] << 4) | pairs[..., 1])
    Pp = repack_2d_to_npaired(p2d, (64, 128))
    np.testing.assert_array_equal(np.asarray(Pp), np.asarray(P))
    np.testing.assert_array_equal(np.asarray(repack_npaired_to_2d(Pp)), np.asarray(p2d))


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("mode", ["subdot", "element"])
def test_paired_kernel_vs_oracle(quant_type, mode):
    """Kernel output == bf16-rounded-units oracle: subdot mode to f32
    accumulation-order noise, element mode to one extra bf16 rounding."""
    N, K, bs, M = 256, 512, 64, 4
    rng = np.random.default_rng(1)
    code = get_4bit_code(quant_type, bs)
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
    absmax = (rng.random((N, K // bs)) * 2 + 0.1).astype(np.float32)
    P = pack_npaired(jnp.asarray(q))
    am_t = jnp.asarray(absmax.T.copy())
    A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    units_bf = np.asarray(jnp.asarray(code[q], jnp.bfloat16), np.float32)
    W = units_bf * np.repeat(absmax, bs, axis=1)
    ref = np.asarray(A, np.float32) @ W.T

    out = np.asarray(
        gemm_4bit_paired(A, P, am_t, code, bs, (N, K), out_dtype=jnp.float32,
                         scale_mode=mode)
    )
    tol = 1e-5 if mode == "subdot" else 1e-2
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < tol, err


def test_paired_nt_kernel_vs_oracle():
    N, K, bs, M = 256, 512, 64, 4
    rng = np.random.default_rng(2)
    code = get_4bit_code("nf4", bs)
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
    absmax = (rng.random((N, K // bs)) + 0.1).astype(np.float32)
    P = pack_npaired(jnp.asarray(q))
    am_t = jnp.asarray(absmax.T.copy())
    G = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)

    units_bf = np.asarray(jnp.asarray(code[q], jnp.bfloat16), np.float32)
    W = units_bf * np.repeat(absmax, bs, axis=1)
    ref = np.asarray(G, np.float32) @ W
    out = np.asarray(
        gemm_4bit_paired_nt(G, P, am_t, code, bs, (N, K), out_dtype=jnp.float32)
    )
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-2, err


def test_quantize_4bit_paired_layout_round_trip():
    """quantize(layout='paired') dequantizes identically to layout='2d'."""
    rng = np.random.default_rng(3)
    W = rng.standard_normal((128, 256)).astype(np.float32)
    p2, s2 = F.quantize_4bit(jnp.asarray(W), blocksize=64, layout="2d")
    pp, sp = F.quantize_4bit(jnp.asarray(W), blocksize=64, layout="paired")
    assert sp.layout == "paired" and pp.shape == (64, 256)
    assert sp.absmax.shape == (4, 128)  # [K/bs, N] transposed
    d2 = np.asarray(F.dequantize_4bit(p2, quant_state=s2))
    dp = np.asarray(F.dequantize_4bit(pp, quant_state=sp))
    np.testing.assert_array_equal(dp, d2)
    # canonical flat absmax identical
    np.testing.assert_array_equal(
        np.asarray(sp.dequant_absmax()), np.asarray(s2.dequant_absmax())
    )


def test_matmul_4bit_paired_matches_2d_class():
    """Full dispatch: matmul_4bit on a paired tensor matches the 2d path to
    quantization-rounding tolerance, and the backward (grad_A) agrees."""
    rng = np.random.default_rng(4)
    N, K = 128, 512
    W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)

    qt2 = QuantizedTensor.quantize(jnp.asarray(W), blocksize=64, layout="2d")
    qtp = QuantizedTensor.quantize(jnp.asarray(W), blocksize=64, layout="paired")

    y2 = np.asarray(bnb.matmul_4bit(x, qt2.data, qt2.state), np.float32)
    yp = np.asarray(bnb.matmul_4bit(x, qtp.data, qtp.state), np.float32)
    np.testing.assert_allclose(yp, y2, rtol=3e-2, atol=3e-2)

    def loss(fn_data, state):
        def f(xx):
            return bnb.matmul_4bit(xx.astype(jnp.bfloat16), fn_data, state).astype(jnp.float32).sum()
        return jax.grad(f)(x.astype(jnp.float32))

    g2 = np.asarray(loss(qt2.data, qt2.state))
    gp = np.asarray(loss(qtp.data, qtp.state))
    np.testing.assert_allclose(gp, g2, rtol=3e-2, atol=3e-2)


def test_to_layout_round_trip():
    rng = np.random.default_rng(5)
    W = rng.standard_normal((64, 128)).astype(np.float32)
    qt = QuantizedTensor.quantize(jnp.asarray(W), blocksize=64, layout="2d")
    qp = qt.to_layout("paired")
    assert qp.state.layout == "paired"
    back = qp.to_layout("2d")
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(qt.data))
    np.testing.assert_array_equal(
        np.asarray(back.state.absmax), np.asarray(qt.state.absmax)
    )
    # dequantization identical through every layout
    np.testing.assert_array_equal(
        np.asarray(qp.dequantize()), np.asarray(qt.dequantize())
    )


def test_paired_serialization_interop_bytes():
    """A paired tensor serializes to the same canonical checkpoint bytes as
    the 2d layout (interop invariance)."""
    from bitsandbytes_tpu.utils.serialization import state_dict_from_params

    rng = np.random.default_rng(6)
    W = rng.standard_normal((64, 128)).astype(np.float32)
    t2 = {"w": QuantizedTensor.quantize(jnp.asarray(W), blocksize=64, layout="2d")}
    tp = {"w": QuantizedTensor.quantize(jnp.asarray(W), blocksize=64, layout="paired")}
    sd2 = state_dict_from_params(t2)
    sdp = state_dict_from_params(tp)
    assert set(sd2) == set(sdp)
    for k in sd2:
        np.testing.assert_array_equal(sd2[k], sdp[k])


def test_paired_double_quant_dispatch():
    """compress_statistics + paired: nested absmax codes store transposed
    [K/bs, N] (the in-kernel decode orientation), forward runs."""
    rng = np.random.default_rng(7)
    N, K = 128, 512
    W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.bfloat16)
    qt = QuantizedTensor.quantize(
        jnp.asarray(W), blocksize=64, layout="paired", compress_statistics=True
    )
    assert qt.state.nested and qt.state.layout == "paired"
    assert qt.state.absmax.shape == (K // 64, N) and qt.state.absmax.dtype == jnp.uint8
    y = np.asarray(bnb.matmul_4bit(x, qt.data, qt.state), np.float32)
    ref = np.asarray(x, np.float32) @ W.T
    assert np.abs(y - ref).max() / np.abs(ref).max() < 0.2  # 4-bit quant noise


def test_paired_dq_inkernel_bit_identical_to_resolved():
    """The in-kernel nested-absmax decode (gemm_4bit_paired_dq — the TPU
    analog of the reference's register-level nested dequant,
    gemm_4bit_simt.cu:104-117) must produce BIT-identical outputs to the
    same kernel running on a resolve_nested() state: the segment-decoded
    scales are shared between the jnp tier (QuantState.dequant_absmax) and
    the kernel tier (_decode_scale_tile).  Covers fwd, NT backward, and the
    large-M fast-dequant route.

    The resolve runs UNDER JIT (like the kernels): eager resolve differs
    by one f32 rounding on ~0.06% of scales because XLA contracts
    ``v * s2 + offset`` into an FMA only when compiling (the known 1-ulp
    eager/jit difference documented in
    test_nested_absmax_dequant_routes_to_segment_decode_under_jit)."""
    from bitsandbytes_tpu.functional.gemm import _inline_dq_ok
    from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
        dequantize_paired_fast,
        dequantize_paired_fast_dq,
        gemm_4bit_paired,
        gemm_4bit_paired_dq,
        gemm_4bit_paired_nt,
        gemm_4bit_paired_nt_dq,
        paired_dequant_dq_supported,
        paired_gemm_dq_supported,
    )

    rng = np.random.default_rng(17)
    N, K, bs, M = 256, 512, 64, 4
    W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    qt = QuantizedTensor.quantize(
        jnp.asarray(W), blocksize=bs, layout="paired", compress_statistics=True
    )
    assert _inline_dq_ok(qt.state)
    assert paired_gemm_dq_supported(M, N, K, bs)
    assert paired_dequant_dq_supported(N, K, bs)
    rs = jax.jit(lambda s: s.resolve_nested())(qt.state)
    code = get_4bit_code("nf4", bs)
    code_t = tuple(float(x) for x in code)

    A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    out_dq = gemm_4bit_paired_dq(
        A, qt.data, qt.state.absmax, qt.state.state2.absmax, qt.state.offset,
        code=code, blocksize=bs, shapeB=(N, K), out_dtype=jnp.float32,
    )
    out_res = gemm_4bit_paired(
        A, qt.data, rs.absmax, code=code, blocksize=bs, shapeB=(N, K),
        out_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(out_dq), np.asarray(out_res))

    G = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
    nt_dq = gemm_4bit_paired_nt_dq(
        G, qt.data, qt.state.absmax, qt.state.state2.absmax, qt.state.offset,
        code=code, blocksize=bs, shapeB=(N, K), out_dtype=jnp.float32,
    )
    nt_res = gemm_4bit_paired_nt(
        G, qt.data, rs.absmax, code=code, blocksize=bs, shapeB=(N, K),
        out_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(nt_dq), np.asarray(nt_res))

    W_dq = dequantize_paired_fast_dq(
        qt.data, qt.state.absmax, qt.state.state2.absmax, qt.state.offset,
        code=code_t, blocksize=bs, dtype=jnp.bfloat16,
    )
    W_res = dequantize_paired_fast(
        qt.data, rs.absmax, code=code_t, blocksize=bs, dtype=jnp.bfloat16,
    )
    np.testing.assert_array_equal(
        np.asarray(W_dq, np.float32), np.asarray(W_res, np.float32)
    )


def test_paired_dq_matmul_dispatch_and_grad():
    """matmul_4bit on a nested paired tensor routes through the in-kernel
    DQ decode (no absmax pre-pass) and its custom-VJP backward matches the
    dequantized-weight reference."""
    rng = np.random.default_rng(18)
    N, K, bs = 256, 512, 64
    W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    qt = QuantizedTensor.quantize(
        jnp.asarray(W), blocksize=bs, layout="paired", compress_statistics=True
    )
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))

    def loss(x):
        return jnp.sum(bnb.matmul_4bit(x, qt.data, qt.state) ** 2)

    g = np.asarray(jax.grad(loss)(x), np.float32)
    Wdq = np.asarray(qt.dequantize(), np.float32)
    y = np.asarray(x, np.float32) @ Wdq.T
    g_ref = 2.0 * y @ Wdq
    np.testing.assert_allclose(g, g_ref, rtol=2e-2, atol=2e-2 * np.abs(g_ref).max())


def test_paired_dq_second_level_block_straddle():
    """K/bs not dividing 256 (e.g. Llama wdown K=14336 -> KB=224): a
    transposed column straddles a second-level 256-block boundary, so the
    in-kernel two-value select per (k-tile, column) must switch mid-column.
    Verified against the resolved state on a shape whose columns straddle."""
    from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
        gemm_4bit_paired,
        gemm_4bit_paired_dq,
        paired_gemm_dq_supported,
    )

    rng = np.random.default_rng(19)
    # KB = K/bs = 24 per column; 256 % 24 != 0 -> boundaries straddle columns
    N, K, bs, M = 64, 768, 32, 2
    W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    qt = QuantizedTensor.quantize(
        jnp.asarray(W), blocksize=bs, layout="paired", compress_statistics=True
    )
    assert paired_gemm_dq_supported(M, N, K, bs)
    rs = jax.jit(lambda s: s.resolve_nested())(qt.state)
    code = get_4bit_code("nf4", bs)
    A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    out_dq = gemm_4bit_paired_dq(
        A, qt.data, qt.state.absmax, qt.state.state2.absmax, qt.state.offset,
        code=code, blocksize=bs, shapeB=(N, K), out_dtype=jnp.float32,
    )
    out_res = gemm_4bit_paired(
        A, qt.data, rs.absmax, code=code, blocksize=bs, shapeB=(N, K),
        out_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(out_dq), np.asarray(out_res))


def test_paired_fast_dequant_matches_class_dequant():
    """dequantize_paired_fast (the large-M matmul route) must match the
    exact dequantization within the bf16 weight-rounding class."""
    from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
        dequantize_paired_fast,
        paired_dequant_supported,
    )

    rng = np.random.default_rng(8)
    N, K, bs = 128, 512, 64
    W = (rng.standard_normal((N, K)) / 8).astype(np.float32)
    qt = QuantizedTensor.quantize(jnp.asarray(W), blocksize=bs, layout="paired")
    assert paired_dequant_supported(N, K, bs)
    Wf = np.asarray(
        dequantize_paired_fast(
            qt.data, qt.state.dequant_absmax_t(),
            code=tuple(float(x) for x in get_4bit_code("nf4", bs)),
            blocksize=bs, dtype=jnp.bfloat16,
        ),
        np.float32,
    )
    Wexact = np.asarray(qt.dequantize(), np.float32)
    rel = np.abs(Wf - Wexact).max() / (np.abs(Wexact).max() + 1e-9)
    assert rel < 1e-2, rel  # two bf16 roundings


def test_large_m_route_matches_fused():
    """The M >= 512 dequant+dot route must agree with the fused kernel to
    quantization-rounding tolerance, forward and grad."""
    rng = np.random.default_rng(9)
    N, K, bs = 128, 512, 64
    W = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    qt = QuantizedTensor.quantize(jnp.asarray(W), blocksize=bs, layout="paired")
    A_small = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    A_big = jnp.concatenate([A_small] * 64, axis=0)  # M=512: the dequant route
    y_small = np.asarray(bnb.matmul_4bit(A_small, qt.data, qt.state), np.float32)
    y_big = np.asarray(bnb.matmul_4bit(A_big, qt.data, qt.state), np.float32)
    np.testing.assert_allclose(y_big[:8], y_small, rtol=3e-2, atol=3e-2)

    g_small = jax.grad(
        lambda x: bnb.matmul_4bit(x.astype(jnp.bfloat16), qt.data, qt.state)
        .astype(jnp.float32).sum()
    )(A_small.astype(jnp.float32))
    g_big = jax.grad(
        lambda x: bnb.matmul_4bit(x.astype(jnp.bfloat16), qt.data, qt.state)
        .astype(jnp.float32).sum()
    )(A_big.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(g_big)[:8], np.asarray(g_small), rtol=3e-2, atol=3e-2
    )
