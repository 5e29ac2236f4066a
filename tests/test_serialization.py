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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_orbax_sharded_roundtrip_resharded(tmp_path):
    """Orbax round-trip of a pjit-sharded quantized train state (SURVEY
    §5.4; the reference's FSDP state-dict scars, optim/optimizer.py:161-271,
    are the failure mode this guards against): a 4-bit QuantizedTensor param
    tree + LoRA adapters + 8-bit optimizer state (uint8 codes + blockwise
    absmax) saved from a 2x4 mesh, restored under a DIFFERENT 4x2 mesh, must
    be bit-exact on every leaf and continue training bit-identically to a
    plain device_put reshard of the in-memory state."""
    ocp = pytest.importorskip(
        "orbax.checkpoint", reason="orbax-checkpoint not installed"
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitsandbytes_tpu import optim, parallel as par

    mesh_a = par.make_mesh({"data": 2, "model": 4})
    mesh_b = par.make_mesh({"data": 4, "model": 2})
    cfg = L.LlamaConfig.tiny()
    params = par.llama_param_specs(
        mesh_a, L.quantize_params_4bit(L.init_params(jax.random.PRNGKey(0), cfg))
    )
    lora = par.shard_quantized_tree(
        L.add_lora(jax.random.PRNGKey(1), cfg, rank=4), mesh_a, lambda p, l: P()
    )
    optimizer = optim.adamw8bit(1e-3, min_8bit_size=16)
    opt_state = optimizer.init(lora)
    assert any(
        l.dtype == jnp.uint8 for l in jax.tree_util.tree_leaves(opt_state)
    ), "fixture must exercise 8-bit (uint8-coded) optimizer state"
    ids = jax.device_put(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (4, 16)),
        NamedSharding(mesh_a, P("data", None)),
    )
    step = jax.jit(
        lambda p, lo, st, i: L.lora_train_step(p, lo, st, i, cfg, optimizer)
    )
    _, lora, opt_state = step(params, lora, opt_state, ids)
    state = {"params": params, "lora": lora, "opt": opt_state}

    ck = ocp.StandardCheckpointer()
    ck.save(str(tmp_path / "ck"), state)
    ck.wait_until_finished()

    # oracle: the same post-step state moved to the new mesh in-memory
    def reshard(x):
        # some leaves come back from jit with GSPMDSharding (no .spec);
        # those are replicated scalars/small arrays in this fixture
        spec = getattr(x.sharding, "spec", P())
        return jax.device_put(x, NamedSharding(mesh_b, spec))

    oracle = jax.tree_util.tree_map(reshard, state)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        oracle,
    )
    restored = ck.restore(str(tmp_path / "ck"), abstract)

    la = jax.tree_util.tree_leaves(restored)
    lb = jax.tree_util.tree_leaves(oracle)
    assert len(la) == len(lb) and len(la) > 100
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: one more step from both copies must agree bit-exactly
    ids_b = jax.device_put(ids, NamedSharding(mesh_b, P("data", None)))
    l_r, lo_r, st_r = step(restored["params"], restored["lora"], restored["opt"], ids_b)
    l_o, lo_o, st_o = step(oracle["params"], oracle["lora"], oracle["opt"], ids_b)
    assert float(l_r) == float(l_o)
    for a, b in zip(
        jax.tree_util.tree_leaves((lo_r, st_r)),
        jax.tree_util.tree_leaves((lo_o, st_o)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
