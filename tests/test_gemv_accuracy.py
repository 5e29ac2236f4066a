"""Statistical-tolerance accuracy tests for the fused 4-bit matmul.

Reference methodology (tests/test_functional.py:865-945): measure the mean
absolute error of the fused gemv against the dequantize+matmul oracle over
random trials, normalize by sqrt(dim), and assert against per-dtype
thresholds; additionally bound the *consistency ratio* between the two
paths' error-vs-fp32 in [0.99, 1.01]-style bands.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_tpu.functional.fourbit import dequantize_4bit, quantize_4bit
from bitsandbytes_tpu.functional.gemm import gemv_4bit

# mean-abs-error thresholds per compute dtype, sqrt(dim)-normalized.
# The reference calibrates mean+7sigma on hardware (test_functional.py:870-894);
# these bounds are set analogously from the bf16/f32 rounding models.
_THRESHOLDS = {
    jnp.float32: 5.0e-5,
    jnp.bfloat16: 5.0e-3,
}


@pytest.mark.parametrize("dim", [256, 512, 1024])
@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gemv_4bit_statistical_accuracy(dim, quant_type, dtype):
    errs = []
    rel = []
    trials = 8
    for t in range(trials):
        key = jax.random.PRNGKey(t)
        k1, k2 = jax.random.split(key)
        A = (jax.random.normal(k1, (1, dim), jnp.float32) / jnp.sqrt(dim)).astype(dtype)
        W = jax.random.normal(k2, (dim, dim), jnp.float32) / jnp.sqrt(dim)
        packed, qs = quantize_4bit(W, blocksize=64, quant_type=quant_type, layout="2d")
        out = gemv_4bit(A, packed, qs)
        Wdq = dequantize_4bit(packed, quant_state=qs)
        ref = jnp.dot(A.astype(jnp.float32), Wdq.T)
        err = jnp.abs(out.astype(jnp.float32) - ref)
        errs.append(float(err.mean()))
        # consistency: fused-vs-fp32 error close to oracle-vs-fp32 error
        fp32 = jnp.dot(A.astype(jnp.float32), W.T)
        e_fused = float(jnp.abs(out.astype(jnp.float32) - fp32).mean())
        e_oracle = float(jnp.abs(ref - fp32).mean())
        rel.append(e_fused / max(e_oracle, 1e-12))
    mean_err = np.mean(errs) * np.sqrt(dim)
    assert mean_err < _THRESHOLDS[dtype], (quant_type, dim, mean_err)
    # both paths should attribute nearly all error to quantization itself
    assert 0.98 < np.mean(rel) < 1.02, np.mean(rel)


def test_gemv_eye_exact():
    """Identity-weight exactness (reference test_gemv_eye_4bit,
    test_functional.py:950): quantizing I and multiplying must return the
    input exactly (NF4 represents +-1 and 0 exactly)."""
    dim = 256
    W = np.eye(dim, dtype=np.float32)
    packed, qs = quantize_4bit(jnp.asarray(W), blocksize=64, quant_type="nf4", layout="2d")
    A = jax.random.normal(jax.random.PRNGKey(0), (4, dim), jnp.float32)
    out = gemv_4bit(A, packed, qs)
    if jax.default_backend() in ("cpu", "gpu"):
        np.testing.assert_array_equal(np.asarray(out), np.asarray(A))
    else:
        # the MXU has no true f32 mode: HIGHEST precision = 3x bf16 passes,
        # exact to ~1 ulp but not bit-exact (the reference's CUDA-core f32
        # path is exact; this is a documented TPU hardware difference)
        np.testing.assert_allclose(np.asarray(out), np.asarray(A), atol=2e-6)


def test_gemm_4bit_grad_A_matches_dequant():
    """Fused transposed-orientation kernel (backward) equals the
    dequantize-then-matmul reference."""
    from bitsandbytes_tpu.functional.gemm import gemm_4bit_grad_A
    from bitsandbytes_tpu.ops import dispatch

    N, K = 512, 512
    W = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32) * 0.05
    packed, qs = quantize_4bit(W, blocksize=64, layout="2d")
    g = jax.random.normal(jax.random.PRNGKey(1), (8, N), jnp.float32).astype(jnp.bfloat16)
    ref = jnp.matmul(
        g.astype(jnp.float32), dequantize_4bit(packed, quant_state=qs)
    )
    # force the Pallas path (interpret mode on CPU)
    old = dispatch.backend()
    dispatch.set_backend("pallas")
    try:
        out = gemm_4bit_grad_A(g, packed, qs)
    finally:
        dispatch.set_backend(old)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )
