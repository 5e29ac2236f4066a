"""Native (C++/OpenMP) host quantizer must be bit-identical to the jnp
oracle (the reference tests its CPU kernels against the default backend the
same way)."""

import numpy as np
import pytest

from bitsandbytes_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("blocksize", [64, 128])
def test_quantize_4bit_host_matches_oracle(quant_type, blocksize):
    import jax.numpy as jnp
    from bitsandbytes_tpu.functional.fourbit import quantize_4bit

    W = np.random.default_rng(0).normal(size=(256, 256)).astype(np.float32)
    packed_n, absmax_n = native.quantize_4bit_host(W, blocksize, quant_type)
    packed_j, qs = quantize_4bit(jnp.asarray(W), blocksize=blocksize, quant_type=quant_type)
    np.testing.assert_array_equal(packed_n, np.asarray(packed_j).reshape(-1))
    np.testing.assert_array_equal(absmax_n, np.asarray(qs.absmax))


def test_quantize_blockwise_host_matches_oracle():
    import jax.numpy as jnp
    from bitsandbytes_tpu.functional.blockwise import quantize_blockwise_with_code
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map

    x = np.random.default_rng(1).normal(size=(4096,)).astype(np.float32) * 0.01
    qn, amn = native.quantize_blockwise_host(x, 256)
    code = jnp.asarray(create_dynamic_map())
    qj, amj = quantize_blockwise_with_code(jnp.asarray(x), code, 256)
    np.testing.assert_array_equal(qn, np.asarray(qj))
    np.testing.assert_array_equal(amn, np.asarray(amj))


def test_dequantize_4bit_host_roundtrip():
    W = np.random.default_rng(2).normal(size=(128, 256)).astype(np.float32)
    packed, absmax = native.quantize_4bit_host(W, 64, "nf4")
    out = native.dequantize_4bit_host(packed, absmax, W.shape, 64, "nf4")
    assert np.abs(out - W).mean() < 0.1  # NF4 quantization error bound
