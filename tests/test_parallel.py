"""Sharding/collective tests on the 8-virtual-CPU-device mesh (the SURVEY.md
§4 multi-host strategy: test distribution logic without TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import bitsandbytes_tpu as bnb
from bitsandbytes_tpu import parallel as par
from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.nn.modules import QuantizedTensor

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def mesh():
    return par.make_mesh({"data": 2, "model": 4})


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    qparams = L.quantize_params_4bit(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    return cfg, qparams, ids


def test_sharded_forward_matches(mesh, setup):
    cfg, qparams, ids = setup
    lq, _ = L.forward(qparams, ids, cfg)
    sparams = par.llama_param_specs(mesh, qparams)
    lq2, _ = jax.jit(lambda p, i: L.forward(p, i, cfg))(sparams, ids)
    np.testing.assert_allclose(
        np.asarray(lq2), np.asarray(lq), atol=0.06, rtol=0.05
    )


def test_packed_payload_is_sharded(mesh, setup):
    cfg, qparams, _ = setup
    sparams = par.llama_param_specs(mesh, qparams)
    qt = sparams["layers"][0]["wq"]
    spec = qt.data.sharding.spec
    assert spec[0] == "model", spec
    # absmax sharded congruently: the 'paired' layout stores it transposed
    # [K/bs, N], so the N axis is dim 1 there
    am_spec = qt.state.absmax.sharding.spec
    if qt.state.layout == "paired":
        assert am_spec[1] == "model", am_spec
    else:
        assert am_spec[0] == "model", am_spec


def test_nested_absmax_replicates(mesh, setup):
    cfg, qparams, _ = setup
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    dq = L.quantize_params_4bit(params, compress_statistics=True)
    sparams = par.llama_param_specs(mesh, dq)
    qt = sparams["layers"][0]["wq"]
    # nested chain is replicated (tiny; blocks don't align to row shards)
    assert qt.state.absmax.sharding.spec == P()
    lq, _ = L.forward(dq, jnp.zeros((1, 8), jnp.int32), cfg)
    lq2, _ = jax.jit(lambda p, i: L.forward(p, i, cfg))(
        sparams, jnp.zeros((1, 8), jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(lq2), np.asarray(lq), atol=0.06, rtol=0.05)


def test_tp_gemm_4bit_allgather_exact(mesh, setup):
    cfg, qparams, _ = setup
    qt = qparams["layers"][0]["wq"]
    A = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.hidden_size)).astype(
        jnp.bfloat16
    )
    ref = bnb.matmul_4bit(A, qt.data, qt.state)
    out = par.tp_gemm_4bit_allgather(A, qt.data, qt.state, mesh, "model")
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)), np.asarray(ref.astype(jnp.float32))
    )


def test_non_divisible_n_replicates(mesh):
    W = jax.random.normal(jax.random.PRNGKey(0), (6, 64))
    qt = QuantizedTensor.quantize(W, blocksize=32)
    specs = par.leaf_sharding(qt, P("model", None), mesh)
    assert specs.data[0] is None  # 6 rows can't split over 4 shards


def test_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_gpipe_matches_sequential(mesh):
    """GPipe over the 'model' axis (reused as pipe) must equal sequential
    layer application; quantized layer weights shard along the stage axis."""
    from bitsandbytes_tpu.parallel import gpipe, stack_stage_params
    from bitsandbytes_tpu.nn.modules import QuantizedTensor

    pipe_mesh = par.make_mesh({"pipe": 4})
    D = 256
    n_layers = 8
    key = jax.random.PRNGKey(0)
    layers = []
    for i in range(n_layers):
        W = jax.random.normal(jax.random.fold_in(key, i), (D, D), jnp.float32) * (D**-0.5)
        layers.append({"w": QuantizedTensor.quantize(W, blocksize=64)})

    def layer_fn(p, a):
        h = bnb.matmul_4bit(a, p["w"].data, p["w"].state)
        return (a + jax.nn.gelu(h.astype(jnp.float32))).astype(a.dtype)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, D), jnp.float32).astype(jnp.bfloat16)

    ref = x
    for p in layers:
        ref = layer_fn(p, ref)

    stacked = stack_stage_params(layers, 4)
    out = gpipe(layer_fn, stacked, x, pipe_mesh, axis="pipe")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05, rtol=0.05
    )


def test_gpipe_differentiable(mesh):
    """Gradients flow through the pipeline (ppermute is differentiable)."""
    from bitsandbytes_tpu.parallel import gpipe, stack_stage_params

    pipe_mesh = par.make_mesh({"pipe": 2})
    D = 64
    layers = [
        {"w": jax.random.normal(jax.random.PRNGKey(i), (D, D), jnp.float32) * 0.05}
        for i in range(4)
    ]
    stacked = stack_stage_params(layers, 2)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, D), jnp.float32)

    def layer_fn(p, a):
        return jnp.tanh(a @ p["w"])

    def loss(stacked):
        return jnp.sum(gpipe(layer_fn, stacked, x, pipe_mesh, axis="pipe") ** 2)

    def loss_seq(stacked):
        per = 4 // 2
        a = x
        for s in range(2):
            for i in range(per):
                a = layer_fn(jax.tree_util.tree_map(lambda t: t[s, i], stacked), a)
        return jnp.sum(a**2)

    g = jax.grad(loss)(stacked)
    g_ref = jax.grad(loss_seq)(stacked)
    np.testing.assert_allclose(
        np.asarray(g["w"]), np.asarray(g_ref["w"]), rtol=1e-3, atol=1e-4
    )


def test_moe_expert_parallel_matches_dense(mesh):
    """Expert-parallel MoE (experts sharded over the mesh) equals the
    single-device dense computation; exercises the `ep` axis."""
    from bitsandbytes_tpu.models import moe

    ep_mesh = par.make_mesh({"expert": 4})
    params, meta = moe.init_moe_params(
        jax.random.PRNGKey(0), hidden=256, ffn=256, n_experts=8
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256), jnp.float32).astype(
        jnp.bfloat16
    )
    ref = moe.moe_ffn(params, meta, x, top_k=2)
    out = moe.moe_ffn_expert_parallel(params, meta, x, ep_mesh, axis="expert", top_k=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.03, rtol=0.05
    )


def test_sharded_kv_decode_matches(mesh, setup):
    """Decode with the KV cache sharded (batch over data, KV heads over
    model) matches unsharded decode."""
    cfg, qparams, ids = setup
    cache = L.init_kv_cache(cfg, 2, 32)
    logits, cache = L.prefill(qparams, ids, cfg, cache)
    tok = jnp.argmax(logits[:, -1], -1)
    ref, _ = L.decode_step(qparams, tok, cfg, cache, jnp.asarray(16))

    scache = par.shard_kv_cache(cache, mesh)
    sparams = par.llama_param_specs(mesh, qparams)
    out, _ = jax.jit(lambda p, t, c: L.decode_step(p, t, cfg, c, jnp.asarray(16)))(
        sparams, tok, scache
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(mesh, causal):
    """Ring attention over a 4-way sequence shard equals full attention."""
    from bitsandbytes_tpu.parallel import ring_attention

    seq_mesh = par.make_mesh({"seq": 4})
    B, T, H, d = 2, 32, 4, 64
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, T, H, d), jnp.float32)
        for i in range(3)
    )
    out = ring_attention(q, k, v, seq_mesh, axis="seq", causal=causal)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tp_gemm_4bit_ring_exact(mesh, setup):
    """The ppermute gather/compute-overlap ring (paired layout) must equal
    the unsharded fused matmul bit-for-bit."""
    cfg, qparams, _ = setup
    qt = qparams["layers"][0]["wq"]
    if qt.state.layout != "paired":
        qt = qt.to_layout("paired")
    A = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.hidden_size)).astype(
        jnp.bfloat16
    )
    ref = bnb.matmul_4bit(A, qt.data, qt.state)
    out = par.tp_gemm_4bit_ring(A, qt.data, qt.state, mesh, "model")
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)), np.asarray(ref.astype(jnp.float32))
    )


def test_kshard_spec_accepted(mesh):
    """K-dim sharding of packed 4-bit weights: the 'paired' layout accepts a
    P(None, 'model') weight spec and shards payload dim 1 / absmax dim 0 in
    whole quant-block multiples (VERDICT r1 item 3; reference FSDP flat-shard
    analog nn/modules.py:545)."""
    W = jax.random.normal(jax.random.PRNGKey(0), (64, 512), jnp.float32)
    qt = QuantizedTensor.quantize(W, blocksize=64, layout="paired")
    specs = par.leaf_sharding(qt, P(None, "model"), mesh)
    assert specs.data == P(None, "model")
    assert specs.state.absmax == P("model", None)  # [K/bs, N]: K is dim 0

    # sharded forward equals unsharded (GSPMD resolves the layout)
    sharded = par.shard_quantized_tree({"w": qt}, mesh, lambda p, l: P(None, "model"))
    A = jax.random.normal(jax.random.PRNGKey(1), (4, 512)).astype(jnp.bfloat16)
    ref = bnb.matmul_4bit(A, qt.data, qt.state)
    out = jax.jit(lambda q, a: bnb.matmul_4bit(a, q["w"].data, q["w"].state))(
        sharded, A
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_kshard_blocks_must_divide(mesh):
    """K-shards that would split a quantization block fall back to
    replication on that axis."""
    W = jax.random.normal(jax.random.PRNGKey(0), (64, 256), jnp.float32)
    qt = QuantizedTensor.quantize(W, blocksize=128, layout="paired")
    # 256 / 4 shards = 64 < blocksize 128 -> K axis must drop to None
    specs = par.leaf_sharding(qt, P(None, "model"), mesh)
    assert specs.data == P(None, None)


def test_kv_cache_specs_paged_shards_heads_not_pool():
    """PagedKVCache dim 1 is the physical block pool, not batch — the
    specs must leave it (and the tables) unsharded and split only the
    KV-HEAD axis over 'model' (VERDICT r3 item 3: multi-device paged
    serving).  Head counts that don't divide the mesh replicate."""
    from bitsandbytes_tpu.models import llama as L
    from bitsandbytes_tpu.parallel.sharding import kv_cache_specs
    from bitsandbytes_tpu.parallel import make_mesh

    cfg = L.LlamaConfig.tiny()  # num_kv_heads = 2
    cache = L.init_paged_kv_cache(cfg, 2, 64, 8, 16, "int8")
    mesh = make_mesh({"data": 2, "model": 2})
    specs = kv_cache_specs(cache, mesh=mesh)
    assert specs.k == P(None, None, "model", None, None)
    assert specs.v == P(None, None, "model", None, None)
    assert specs.k_scale == P(None, None, "model", None)
    assert specs.tables == P()
    # non-dividing head count falls back to replication
    mesh3 = make_mesh({"model": 4}) if len(jax.devices()) >= 4 else None
    if mesh3 is not None:
        specs3 = kv_cache_specs(cache, mesh=mesh3)
        assert specs3.k == P(None, None, None, None, None)
