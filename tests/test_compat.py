"""Reference-name compatibility surface: a bitsandbytes user's imports must
resolve and behave (SURVEY.md §2.1; the names map to this repo's JAX-native
implementations — see each shim's docstring for the delegation)."""

import jax
import jax.numpy as jnp
import numpy as np

import bitsandbytes_tpu.functional as F
import bitsandbytes_tpu.nn as nn
import bitsandbytes_tpu.utils as U


def test_quantize_nf4_fp4_named_wrappers_roundtrip():
    W = jax.random.normal(jax.random.PRNGKey(0), (64, 64), jnp.float32)
    for qfn, dqfn, qt in (
        (F.quantize_nf4, F.dequantize_nf4, "nf4"),
        (F.quantize_fp4, F.dequantize_fp4, "fp4"),
    ):
        packed, qs = qfn(W, blocksize=64)
        assert qs.quant_type == qt
        out = dqfn(packed, qs)
        # matches the canonical entry point exactly
        p2, qs2 = F.quantize_4bit(W, blocksize=64, quant_type=qt)
        np.testing.assert_array_equal(np.asarray(packed), np.asarray(p2))
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(F.dequantize_4bit(p2, qs2))
        )


def test_get_4bit_type_alias():
    np.testing.assert_array_equal(
        np.asarray(F.get_4bit_type("nf4")), np.asarray(F.get_4bit_code("nf4"))
    )


def test_pack_unpack_dict_tensor_roundtrip():
    d = {"quant_type": "nf4", "blocksize": 64, "shape": [4, 8]}
    t = U.pack_dict_to_tensor(d)
    assert t.dtype == np.uint8
    assert U.unpack_tensor_to_dict(t) == d
    # accepts a jax array too (state-dict reload path)
    assert U.unpack_tensor_to_dict(jnp.asarray(t)) == d


def test_replace_linear_quantizes_tree_and_skips():
    params = {
        "layers": [{"wq": jnp.ones((64, 64), jnp.float32)}],
        "lm_head": jnp.ones((64, 128), jnp.float32),
        "norm": jnp.ones((64,), jnp.float32),
    }
    out = U.replace_linear(params)
    assert isinstance(out["layers"][0]["wq"], nn.QuantizedTensor)
    assert not isinstance(out["lm_head"], nn.QuantizedTensor)  # skipped
    assert not isinstance(out["norm"], nn.QuantizedTensor)  # 1-D untouched


def test_outlier_tracer_finds_planted_outliers():
    W = jnp.ones((64, 64), jnp.float32).at[:, 3].mul(100.0)
    tr = U.OutlierTracer.get_instance()
    mask = np.asarray(tr.get_outliers(W))  # static-shape boolean mask
    assert mask[3] and mask.sum() == 1
    assert tr.get_outliers(W) is tr.get_outliers(W)  # memoized by identity


def test_params4bit_int8params_aliases():
    assert nn.Params4bit is nn.QuantizedTensor
    assert nn.Int8Params is nn.Int8TensorState
    qt = nn.Params4bit.quantize(jnp.ones((64, 64), jnp.float32))
    assert isinstance(qt, nn.QuantizedTensor)


def test_optim_layer_compat_names():
    """GlobalOptimManager path-regex overrides + the Optimizer1/2State/8bit
    entry points (reference optim/optimizer.py) delegate to the optax
    factories and actually optimize."""
    import optax

    import bitsandbytes_tpu.optim as O

    mgr = O.GlobalOptimManager.get_instance()
    mgr.initialize()
    mgr.override_config(r"embed", "optim_bits", 32)
    opt = mgr.build("adam", 1e-2, optim_bits=8)
    assert isinstance(opt, optax.GradientTransformation)

    params = {"embed": jnp.ones((4, 8)), "w": jnp.ones((128, 128))}
    state = opt.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = opt.update(g, state, params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(upd))

    # the reference's SGD passes family "momentum" to Optimizer1State
    for f, fam in ((O.Optimizer1State, "momentum"), (O.Optimizer2State, "adam")):
        t = f(fam, 1e-3, optim_bits=32)
        assert isinstance(t, optax.GradientTransformation)
    assert isinstance(O.Optimizer8bit("adam"), optax.GradientTransformation)
    assert isinstance(O.PytorchLARS(), optax.GradientTransformation)
    args = O.MockArgs({"optim_bits": 8})
    assert args.optim_bits == 8
