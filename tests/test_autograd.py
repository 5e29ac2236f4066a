"""Gradient correctness for the custom-VJP matmuls (reference
tests/test_autograd.py: matmul/matmul_4bit gradients vs torch autograd;
here vs jax.grad on the explicit dequantized computation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bitsandbytes_tpu as bnb
from bitsandbytes_tpu.functional.fourbit import dequantize_4bit, quantize_4bit
from bitsandbytes_tpu.functional.int8 import int8_vectorwise_quant


@pytest.mark.parametrize("lead", [(4,), (2, 3)])
def test_matmul_4bit_grad_matches_dequant(lead):
    K, N = 256, 128
    W = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32) * 0.1
    packed, qs = quantize_4bit(W, blocksize=64, layout="2d")
    Wdq = dequantize_4bit(packed, quant_state=qs)
    A = jax.random.normal(jax.random.PRNGKey(1), (*lead, K), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float32)

    def f_q(a, b):
        return jnp.sum(bnb.matmul_4bit(a, packed, qs, bias=b) ** 2)

    def f_ref(a, b):
        return jnp.sum((a @ Wdq.T + b) ** 2)

    ga_q, gb_q = jax.grad(f_q, argnums=(0, 1))(A, bias)
    ga_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(A, bias)
    np.testing.assert_allclose(np.asarray(ga_q), np.asarray(ga_r), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb_q), np.asarray(gb_r), rtol=1e-4, atol=1e-6)


def test_matmul_4bit_no_weight_grad():
    """The packed weight and quant state must produce no gradient path
    (reference MatMul4Bit: frozen weight, autograd/_functions.py:364-386)."""
    K, N = 256, 128
    W = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    packed, qs = quantize_4bit(W, blocksize=64, layout="2d")
    A = jax.random.normal(jax.random.PRNGKey(1), (4, K), jnp.float32)

    def f(absmax):
        qs2 = jax.tree_util.tree_map(lambda x: x, qs)
        import dataclasses

        qs2 = dataclasses.replace(qs2, absmax=absmax)
        return jnp.sum(bnb.matmul_4bit(A, packed, qs2))

    g = jax.grad(f)(qs.absmax)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_int8_training_grad_matches_reference():
    """has_fp16_weights training path: grad_B is an *int8* matmul of the
    column-quantized grad with the column-quantized activations — the
    LLM.int8() training-speed path (reference MatMul8bitLt backward,
    autograd/_functions.py:216-233) — and grad_A uses the dequantized int8
    weight (:235-238)."""
    K, N, B = 256, 128, 8
    Wf = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32) * 0.1
    A = jax.random.normal(jax.random.PRNGKey(1), (B, K), jnp.float32)
    state = bnb.MatmulLtState(has_fp16_weights=True)

    def f(a, w):
        return jnp.sum(bnb.matmul(a, w, state) ** 2)

    ga, gw = jax.grad(f, argnums=(0, 1))(A, Wf)
    # reference gradients computed on the dequantized weight
    CB, SCB, _ = int8_vectorwise_quant(Wf)
    Wdq = CB.astype(jnp.float32) * (SCB[:, None] / 127.0)
    out = bnb.matmul(A, Wf, state)
    g_out = 2.0 * out.astype(jnp.float32)
    ga_ref = g_out @ Wdq
    gw_exact = np.asarray(g_out.T @ A)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), rtol=2e-2, atol=2e-2)

    # the exact int8 reference for grad_B: quantize g columns and A columns
    # to int8, int8 matmul, dequantize (mirrors _functions.py:221-228)
    def colq(x):
        cs = np.abs(np.asarray(x)).max(axis=0)
        q = np.clip(np.round(np.asarray(x) * (127.0 / np.maximum(cs, 1e-38))), -127, 127)
        return q.astype(np.int32), cs

    Cgt, SCgt = colq(g_out)
    CAt, SCAt = colq(A)
    gw_ref = (Cgt.T @ CAt).astype(np.float64) * (
        SCgt[:, None] * SCAt[None, :] / (127.0 * 127.0)
    )
    np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-4, atol=1e-4)
    # and the int8 grad_B stays within the LLM.int8() error budget of exact
    scale = np.abs(gw_exact).max()
    assert np.abs(np.asarray(gw) - gw_exact).max() / scale < 0.05


def test_int8_frozen_grad_flows_to_activations_only():
    K, N = 256, 128
    W = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    CB, SCB, _ = int8_vectorwise_quant(W)
    state = bnb.MatmulLtState(CB=CB, SCB=SCB)
    A = jax.random.normal(jax.random.PRNGKey(1), (4, K), jnp.float32)
    g = jax.grad(lambda a: jnp.sum(bnb.matmul(a, None, state)))(A)
    Wdq = CB.astype(jnp.float32) * (SCB[:, None] / 127.0)
    ref = jnp.ones((4, N)) @ Wdq
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_outlier_threshold_forward_grad():
    """Outlier decomposition path (threshold > 0) is differentiable."""
    K, N = 256, 128
    W = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    CB, SCB, _ = int8_vectorwise_quant(W)
    state = bnb.MatmulLtState(CB=CB, SCB=SCB, threshold=6.0)
    A = jax.random.normal(jax.random.PRNGKey(1), (4, K), jnp.float32)
    A = A.at[:, 3].set(20.0)  # plant outliers
    g = jax.grad(lambda a: jnp.sum(bnb.matmul(a, None, state)))(A)
    assert np.isfinite(np.asarray(g)).all()


def test_int8_training_grad_with_outliers():
    """threshold > 0 training: grad_B = int8 part (outlier columns zeroed)
    + exact fp contribution of the outlier columns (reference
    _functions.py:229-233); total must match the straight-through g^T @ A
    within the int8 budget and be EXACT on the outlier columns."""
    K, N, B = 256, 128, 8
    key = jax.random.PRNGKey(3)
    Wf = jax.random.normal(key, (N, K), jnp.float32) * 0.1
    A = jax.random.normal(jax.random.PRNGKey(4), (B, K), jnp.float32)
    # plant strong outliers in two columns
    A = A.at[:, 7].mul(20.0).at[:, 101].mul(25.0)
    th = 6.0
    state = bnb.MatmulLtState(has_fp16_weights=True, threshold=th)

    def f(a, w):
        return jnp.sum(bnb.matmul(a, w, state) ** 2)

    ga, gw = jax.grad(f, argnums=(0, 1))(A, Wf)
    out = bnb.matmul(A, Wf, state)
    g_out = np.asarray(2.0 * out.astype(jnp.float32))
    A_np = np.asarray(A)
    outlier_cols = (np.abs(A_np) >= th).any(axis=0)
    assert outlier_cols[7] and outlier_cols[101]
    gw_exact = g_out.T @ A_np
    gw_np = np.asarray(gw)
    # outlier columns carry the exact fp correction
    np.testing.assert_allclose(
        gw_np[:, outlier_cols], gw_exact[:, outlier_cols], rtol=1e-4, atol=1e-3
    )
    # inlier columns within the int8 quantization budget
    scale = np.abs(gw_exact).max()
    assert np.abs(gw_np - gw_exact).max() / scale < 0.05
    assert np.isfinite(np.asarray(ga)).all()


def test_int8_training_outlier_budget_overflow():
    """Fixed-budget outlier residuals (VERDICT r2 item 7): when the number
    of outlier columns exceeds the static budget, the FORWARD is unchanged
    and the uncaptured columns degrade to int8-precision grads instead of
    being dropped; within budget, grads equal the default-budget path."""
    K, N, B = 256, 128, 8
    Wf = jax.random.normal(jax.random.PRNGKey(3), (N, K), jnp.float32) * 0.1
    A = jax.random.normal(jax.random.PRNGKey(4), (B, K), jnp.float32)
    cols = [3, 17, 50, 77, 103, 140, 200, 230]
    for c in cols:
        A = A.at[:, c].mul(30.0)
    th = 6.0

    def run(budget):
        state = bnb.MatmulLtState(
            has_fp16_weights=True, threshold=th, outlier_budget=budget
        )
        f = lambda a, w: jnp.sum(bnb.matmul(a, w, state) ** 2)
        out = bnb.matmul(A, Wf, state)
        ga, gw = jax.grad(f, argnums=(0, 1))(A, Wf)
        return np.asarray(out), np.asarray(ga), np.asarray(gw)

    out_big, ga_big, gw_big = run(32)    # all 8 outlier cols captured
    out_sm, ga_sm, gw_sm = run(4)        # only 4 fit: overflow
    np.testing.assert_array_equal(out_big, out_sm)  # forward ignores budget
    np.testing.assert_allclose(ga_big, ga_sm, rtol=1e-6)

    out = bnb.matmul(A, Wf, bnb.MatmulLtState(has_fp16_weights=True, threshold=th))
    gw_exact = np.asarray(2.0 * out.astype(jnp.float32)).T @ np.asarray(A)
    scale = np.abs(gw_exact).max()
    # big budget: every outlier column exact
    np.testing.assert_allclose(
        gw_big[:, cols], gw_exact[:, cols], rtol=1e-4, atol=1e-3 * scale
    )
    # overflow: uncaptured outlier columns are approximated, NOT dropped —
    # int8 class error, and far better than the zero a dropped column gives
    err = np.abs(gw_sm[:, cols] - gw_exact[:, cols]).max()
    assert err / scale < 0.1, err / scale
    assert np.abs(gw_sm[:, cols]).max() > 0.5 * np.abs(gw_exact[:, cols]).max()
