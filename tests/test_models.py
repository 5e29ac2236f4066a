"""Llama-family model tests: quantized forward fidelity, KV-cache decode
consistency, QLoRA training (the SURVEY.md §4 e2e-generation analog,
reference tests/test_generation.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_tpu.models import llama as L


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    return cfg, params, ids


def test_quantized_forward_close_to_fp(setup):
    cfg, params, ids = setup
    lf, _ = L.forward(params, ids, cfg)
    for qparams in (
        L.quantize_params_4bit(params),
        L.quantize_params_4bit(params, compress_statistics=True),
        L.quantize_params_int8(params),
    ):
        lq, _ = L.forward(qparams, ids, cfg)
        corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
        assert corr > 0.9, corr


def test_decode_cache_consistency(setup):
    """Logits from cached decode must match the uncached full forward."""
    cfg, params, ids = setup
    qparams = L.quantize_params_4bit(params)
    cache = L.init_kv_cache(cfg, 2, 32)
    logits, cache = L.prefill(qparams, ids, cfg, cache)
    tok = jnp.argmax(logits[:, -1], -1)
    lg, cache = L.decode_step(qparams, tok, cfg, cache, jnp.asarray(16))
    ids2 = jnp.concatenate([ids, tok[:, None]], axis=1)
    lfull, _ = L.forward(qparams, ids2, cfg)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(lfull[:, 16]), atol=0.05, rtol=0.05
    )


def test_decode_step_jits(setup):
    cfg, params, _ = setup
    qparams = L.quantize_params_4bit(params)
    cache = L.init_kv_cache(cfg, 2, 32)
    step = jax.jit(lambda p, t, c, pos: L.decode_step(p, t, cfg, c, pos))
    tok = jnp.zeros((2,), jnp.int32)
    lg, cache = step(qparams, tok, cache, jnp.asarray(0))
    lg2, cache = step(qparams, jnp.argmax(lg, -1), cache, jnp.asarray(1))
    assert lg2.shape == (2, cfg.vocab_size)
    assert np.isfinite(np.asarray(lg2)).all()


def test_int8_threshold_forward(setup):
    cfg, params, ids = setup
    qparams = L.quantize_params_int8(params)
    lq, _ = L.forward(qparams, ids, cfg, int8_threshold=6.0)
    assert np.isfinite(np.asarray(lq)).all()


def test_qlora_training_reduces_loss(setup):
    cfg, params, _ = setup
    from bitsandbytes_tpu import optim

    qparams = L.quantize_params_4bit(params)
    lora = L.add_lora(jax.random.PRNGKey(3), cfg, rank=4)
    opt = optim.adamw8bit(5e-3)
    ost = opt.init(lora)
    ids = jax.random.randint(jax.random.PRNGKey(4), (4, 17), 0, cfg.vocab_size)
    ts = jax.jit(lambda p, lo, o, i: L.lora_train_step(p, lo, o, i, cfg, opt))
    losses = []
    for _ in range(5):
        loss, lora, ost = ts(qparams, lora, ost, ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # base weights are untouched by construction (lora tree is separate)


def test_lora_grads_dont_touch_base(setup):
    """The 4-bit base is frozen: no gradient path exists into the packed
    payload or absmax (reference MatMul4Bit has no weight grad,
    autograd/_functions.py:364-386)."""
    cfg, params, _ = setup
    qparams = L.quantize_params_4bit(params)
    lora = L.add_lora(jax.random.PRNGKey(3), cfg, rank=2)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 9), 0, cfg.vocab_size)
    g = jax.grad(lambda lo: L.lm_loss(qparams, lo, ids, cfg))(lora)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_fused_projection_layout_matches(setup):
    """fuse=True (wqkv / gate_up) is numerically identical to per-projection
    quantization (rows own whole quant blocks, so concatenation commutes
    with quantization)."""
    cfg, params, ids = setup
    q1 = L.quantize_params_4bit(params)
    q2 = L.quantize_params_4bit(params, fuse=True)
    l1, _ = L.forward(q1, ids, cfg)
    l2, _ = L.forward(q2, ids, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0.05, rtol=0.05)


def test_lora_applies_on_fused_layout(setup):
    """LoRA adapters must contribute when the base was quantized with
    fuse=True (wqkv/gate_up), and their gradients must be nonzero."""
    cfg, params, ids = setup
    qfused = L.quantize_params_4bit(params, fuse=True)
    lora = L.add_lora(jax.random.PRNGKey(3), cfg, rank=4,
                      targets=("wq", "wk", "wv", "wo", "gate", "up"))
    # give the adapters nonzero B so they change the forward
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 2 else x, lora
    )
    l0, _ = L.forward(qfused, ids, cfg)
    l1, _ = L.forward(qfused, ids, cfg, lora=lora)
    assert float(jnp.abs(l1 - l0).max()) > 1e-3  # adapters take effect

    g = jax.grad(lambda lo: L.lm_loss(qfused, lo, ids, cfg))(lora)
    for name in ("wq", "wk", "wv", "gate", "up"):
        ga = np.asarray(g["layers"][0][name]["a"])
        assert np.abs(ga).max() > 0.0, name


def _tiny_family(**over):
    from bitsandbytes_tpu.models.llama import LlamaConfig

    base = dict(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
    )
    base.update(over)
    return LlamaConfig(**base)


@pytest.mark.parametrize(
    "name,over",
    [
        ("mistral", dict(sliding_window=8)),
        ("qwen2", dict(attn_bias=True)),
        ("gemma", dict(act="gelu", norm_plus_one=True, scale_embed=True)),
    ],
)
def test_model_families_quantized_forward(name, over):
    """Mistral/Qwen2/Gemma-style configs run the quantized decode path end
    to end (prefill -> decode step, NF4 + fused layout)."""
    cfg = _tiny_family(**over)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    qparams = L.quantize_params_4bit(params, fuse=True)
    if over.get("attn_bias"):
        assert "wqkv_b" in qparams["layers"][0]
    cache = L.init_kv_cache(cfg, 2, 32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    logits, cache = L.prefill(qparams, ids, cfg, cache)
    assert np.isfinite(np.asarray(logits)).all()
    tok = jnp.argmax(logits[:, -1], -1)
    out, _ = L.decode_step(qparams, tok, cfg, cache, jnp.asarray(8))
    assert out.shape == (2, cfg.vocab_size)
    assert np.isfinite(np.asarray(out)).all()


def test_sliding_window_masks_old_positions():
    """Mistral-style local attention: with window w, a query at position p
    must ignore keys at positions <= p - w (change them -> output constant)."""
    cfg = _tiny_family(sliding_window=4)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    logits1, _ = L.forward(params, ids, cfg)
    # perturb early tokens (positions 0..7, all > window away from pos 11)
    ids2 = ids.at[0, :4].set((ids[0, :4] + 1) % cfg.vocab_size)
    logits2, _ = L.forward(params, ids2, cfg)
    # the final position attends only to positions 8..11 -> unchanged.
    # (layer stacking propagates within-window info only: with 2 layers and
    # window 4, position 11 sees back to position 11 - 2*(4-1) = 5 > 3.)
    np.testing.assert_allclose(
        np.asarray(logits1[0, -1]), np.asarray(logits2[0, -1]), atol=1e-5
    )
    # sanity: without the window the same perturbation changes the output
    cfg_full = _tiny_family()
    l1, _ = L.forward(params, ids, cfg_full)
    l2, _ = L.forward(params, ids2, cfg_full)
    assert np.abs(np.asarray(l1[0, -1]) - np.asarray(l2[0, -1])).max() > 1e-4


def test_qwen2_bias_participates():
    cfg = _tiny_family(attn_bias=True)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    # distinct tokens: a q-bias only shifts attention *weights*, which is
    # invisible when every value vector is identical
    ids = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    l1, _ = L.forward(params, ids, cfg)
    params["layers"][0]["wq_b"] = params["layers"][0]["wq_b"] + 1.0
    l2, _ = L.forward(params, ids, cfg)
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-5


def test_hf_import_qwen2_biases():
    """import_hf_llama picks up q/k/v projection biases when present."""
    from bitsandbytes_tpu.utils.serialization import import_hf_llama

    cfg = _tiny_family(attn_bias=True, num_layers=1)
    rng = np.random.default_rng(0)
    D, H, KVH, hd, F = 256, 4, 2, 64, 512
    sd = {}
    names = {
        "self_attn.q_proj": (H * hd, D), "self_attn.k_proj": (KVH * hd, D),
        "self_attn.v_proj": (KVH * hd, D), "self_attn.o_proj": (D, H * hd),
        "mlp.gate_proj": (F, D), "mlp.up_proj": (F, D), "mlp.down_proj": (D, F),
    }
    for hf, shp in names.items():
        sd[f"model.layers.0.{hf}.weight"] = rng.standard_normal(shp).astype(np.float32) * 0.02
    for hf in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
        n = names[hf][0]
        sd[f"model.layers.0.{hf}.bias"] = rng.standard_normal(n).astype(np.float32) * 0.1
    sd["model.layers.0.input_layernorm.weight"] = np.ones(D, np.float32)
    sd["model.layers.0.post_attention_layernorm.weight"] = np.ones(D, np.float32)
    sd["model.embed_tokens.weight"] = rng.standard_normal((512, D)).astype(np.float32) * 0.02
    sd["model.norm.weight"] = np.ones(D, np.float32)
    params = import_hf_llama(sd, cfg)
    assert "wq_b" in params["layers"][0]
    logits, _ = L.forward(params, jnp.zeros((1, 4), jnp.int32), cfg)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.tpu_only
def test_flash_attention_path_matches_dense():
    """The Pallas flash-attention route (no-cache causal, T >= 1024) must
    match the masked dense path within bf16 class and be differentiable.
    TPU-only: the upstream kernel has no interpret mode."""
    import dataclasses
    from bitsandbytes_tpu.models.llama import _flash_ok

    cfg = L.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
    )
    assert _flash_ok(cfg, 1024, 128)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 1024), 0, cfg.vocab_size)
    lf, _ = jax.jit(lambda p, i: L.forward(p, i, cfg))(params, ids)
    # a huge sliding window makes the mask identical but forces dense
    cfg_dense = dataclasses.replace(cfg, sliding_window=1 << 20)
    ld, _ = jax.jit(lambda p, i: L.forward(p, i, cfg_dense))(params, ids)
    a, b = np.asarray(lf), np.asarray(ld)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 2e-2, rel
    g = jax.grad(lambda p: L.forward(p, ids, cfg)[0].astype(jnp.float32).sum())(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_chunked_lm_loss_matches_dense():
    """token_chunk lm_loss == dense lm_loss (value and grads) while never
    materializing [B*T, V] logits; pad tail (N % chunk != 0) is masked."""
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    qparams = L.quantize_params_4bit(params)
    lora = L.add_lora(jax.random.PRNGKey(1), cfg, rank=4)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 11), 0, cfg.vocab_size)

    # on the real chip f32 dots truncate to bf16 (excess-precision flag),
    # so the dense-vs-chunked split changes accumulation at the bf16 error
    # class; CPU (highest precision) is the bit-level contract
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    rtol, gtol = (1e-2, 1e-2) if on_tpu else (2e-6, 2e-6)
    dense = L.lm_loss(qparams, lora, ids, cfg)
    for chunk in (4, 7, 32):  # 20 tokens: even split, ragged, single chunk
        chunked = L.lm_loss(qparams, lora, ids, cfg, token_chunk=chunk)
        np.testing.assert_allclose(float(chunked), float(dense), rtol=rtol)

    g_dense = jax.grad(lambda lo: L.lm_loss(qparams, lo, ids, cfg))(lora)
    g_chunk = jax.grad(
        lambda lo: L.lm_loss(qparams, lo, ids, cfg, token_chunk=7)
    )(lora)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_dense), jax.tree_util.tree_leaves(g_chunk)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=gtol)


def test_chunked_lm_loss_int8_threshold_matches_dense():
    """The chunked path must apply int8_threshold on the lm_head exactly
    like the dense path (it silently dropped it before round 5): with an
    int8 lm_head and outliers that trip the threshold, chunked == dense,
    and the threshold must actually change the loss (guards against the
    passthrough becoming a no-op)."""
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    # plant outlier columns in the lm_head so threshold=2.0 decomposes
    params["lm_head"] = params["lm_head"].at[:, :3].mul(50.0)
    q8 = L.quantize_params_int8(params, quantize_lm_head=True)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 11), 0, cfg.vocab_size)

    dense_thr = L.lm_loss(q8, None, ids, cfg, int8_threshold=2.0)
    chunk_thr = L.lm_loss(q8, None, ids, cfg, token_chunk=7, int8_threshold=2.0)
    # not bit-identical: the outlier column set is detected per activation
    # chunk (reference MatMul8bitLt semantics — per-matmul detection), so
    # chunked quantization error differs at the ~1e-5 relative level (and
    # on the real chip f32 dots truncate to bf16, widening it further)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    np.testing.assert_allclose(
        float(chunk_thr), float(dense_thr), rtol=1e-2 if on_tpu else 2e-4
    )
    # threshold-off differs at a much larger scale: proves the flag
    # reaches the chunked lm_head rather than being silently dropped
    chunk_off = L.lm_loss(q8, None, ids, cfg, token_chunk=7)
    assert abs(float(chunk_off) - float(dense_thr)) > 10 * abs(
        float(chunk_thr) - float(dense_thr)
    )


def test_llama3_70b_config_geometry():
    """BASELINE 70B rows: config dims are consistent and kernel-tileable
    (K % 256 == 0, N even for the paired layout, hd % 128 == 0 for flash)."""
    cfg = L.LlamaConfig.llama3_70b(num_layers=1)
    assert cfg.num_heads * cfg.head_dim == cfg.hidden_size
    assert cfg.head_dim % 128 == 0
    for K in (cfg.hidden_size, cfg.intermediate_size):
        assert K % 256 == 0
    for N in (cfg.hidden_size, cfg.intermediate_size,
              cfg.num_kv_heads * cfg.head_dim):
        assert N % 2 == 0


def test_qwen25_32b_config_geometry():
    cfg = L.LlamaConfig.qwen25_32b(num_layers=1)
    assert cfg.num_heads * cfg.head_dim == cfg.hidden_size
    assert cfg.hidden_size % 256 == 0 and cfg.intermediate_size % 256 == 0
    assert cfg.attn_bias
