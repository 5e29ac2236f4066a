"""Flash cached-attention kernel (ops/pallas/flash_cached.py) vs the dense
oracle: decode + cached prefill, bf16 and int8 KV, GQA folding, per-slot
lengths, sliding window.  Runs the kernel in interpret mode on CPU
(SURVEY.md §4 oracle pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_tpu.ops.pallas.flash_cached import (
    flash_attention_cached,
    flash_cached_supported,
)

B, KVH, G, HD = 2, 2, 3, 128
S = 256


def dense_ref(q, k, v, lengths, T, window=None):
    """Dense attention oracle matching models/llama._attention semantics.
    q [B, KVH, G*T, hd]; k/v [B, KVH, S, hd] float; lengths [B] = newest
    query position."""
    out = np.zeros_like(np.asarray(q, np.float32))
    for b in range(B):
        for h in range(KVH):
            for r in range(q.shape[2]):
                t = r % T
                q_pos = int(lengths[b]) - (T - 1) + t
                kv_pos = np.arange(S)
                mask = kv_pos <= q_pos
                if window is not None:
                    mask &= kv_pos > q_pos - window
                s = (
                    np.asarray(q[b, h, r], np.float32)
                    @ np.asarray(k[b, h], np.float32).T
                ) * HD**-0.5
                s = np.where(mask, s, -np.inf)
                p = np.exp(s - s.max())
                p /= p.sum()
                out[b, h, r] = p @ np.asarray(v[b, h], np.float32)
    return out


def _mk(key, int8=False):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, KVH, G * 1, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, KVH, S, HD), jnp.float32)
    v = jax.random.normal(ks[2], (B, KVH, S, HD), jnp.float32)
    if not int8:
        return q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), None, None
    absmax_k = jnp.max(jnp.abs(k), axis=-1)
    absmax_v = jnp.max(jnp.abs(v), axis=-1)
    ksc, vsc = absmax_k / 127.0, absmax_v / 127.0
    k8 = jnp.round(k / ksc[..., None]).astype(jnp.int8)
    v8 = jnp.round(v / vsc[..., None]).astype(jnp.int8)
    return q.astype(jnp.bfloat16), k8, v8, ksc, vsc


@pytest.mark.parametrize("int8", [False, True], ids=["bf16kv", "int8kv"])
def test_flash_decode_matches_dense(int8):
    assert flash_cached_supported(1, S, HD)
    q, k, v, ksc, vsc = _mk(jax.random.PRNGKey(0), int8)
    lengths = jnp.asarray([5, S - 1], jnp.int32)  # slots at different depths
    out = flash_attention_cached(q, k, v, lengths, T=1, k_scale=ksc, v_scale=vsc)
    if int8:
        kf = np.asarray(k, np.float32) * np.asarray(ksc)[..., None]
        vf = np.asarray(v, np.float32) * np.asarray(vsc)[..., None]
    else:
        kf, vf = np.asarray(k, np.float32), np.asarray(v, np.float32)
    ref = dense_ref(np.asarray(q, np.float32), kf, vf, np.asarray(lengths), T=1)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.02, rtol=0.02)


def test_flash_prefill_T_matches_dense():
    """Cached prefill: T=8 new tokens, causal among themselves, cache
    positions beyond the written region never attended."""
    T = 8
    q = jax.random.normal(jax.random.PRNGKey(1), (B, KVH, G * T, HD), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(2), (B, KVH, S, HD), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(3), (B, KVH, S, HD), jnp.bfloat16)
    start = 100
    lengths = jnp.full((B,), start + T - 1, jnp.int32)
    out = flash_attention_cached(q, k, v, lengths, T=T)
    ref = dense_ref(
        np.asarray(q, np.float32), np.asarray(k, np.float32),
        np.asarray(v, np.float32), np.asarray(lengths), T=T,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.02, rtol=0.02)


def test_flash_sliding_window():
    q, k, v, _, _ = _mk(jax.random.PRNGKey(4))
    lengths = jnp.asarray([S - 1, 64], jnp.int32)
    out = flash_attention_cached(q, k, v, lengths, T=1, window=32)
    ref = dense_ref(
        np.asarray(q, np.float32), np.asarray(k, np.float32),
        np.asarray(v, np.float32), np.asarray(lengths), T=1, window=32,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.02, rtol=0.02)


def test_llama_forward_flash_matches_dense_cpu():
    """End-to-end: the llama cached forward under the Pallas tier (flash
    kernel, interpret mode) matches the dense oracle tier — decode AND
    cached prefill, int8 KV."""
    from bitsandbytes_tpu.models import llama as L
    from bitsandbytes_tpu.ops import dispatch

    cfg = L.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=128,
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)

    def run():
        cache = L.init_kv_cache(cfg, 2, 128, kv_dtype="int8")
        logits, cache = L.forward(params, ids, cfg, cache=cache, start_pos=0)
        tok = jnp.argmax(logits[:, -1], -1)
        lg, cache = L.forward(
            params, tok[:, None], cfg, cache=cache,
            start_pos=jnp.asarray([8, 8], jnp.int32),
        )
        return np.asarray(logits, np.float32), np.asarray(lg, np.float32)

    try:
        dispatch.set_backend("reference")
        lp_ref, ld_ref = run()
        dispatch.set_backend("pallas")
        lp, ld = run()
    finally:
        dispatch.set_backend("auto")
    np.testing.assert_allclose(lp, lp_ref, atol=0.1, rtol=0.05)
    np.testing.assert_allclose(ld, ld_ref, atol=0.1, rtol=0.05)


def test_long_cached_prefill_chunks_over_T(monkeypatch):
    """Cached prefill with G*T beyond the kernel's VMEM row budget splits
    into T-chunks (models/llama.py) instead of routing to the dense path —
    chunked output must equal the single-call flash output exactly (same
    kernel, same blocks, only the q fold is split)."""
    from bitsandbytes_tpu.models import llama as L
    from bitsandbytes_tpu.ops.pallas import flash_cached

    cfg = L.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=128,
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)

    def prefill():
        cache = L.init_kv_cache(cfg, 1, 128)
        logits, _ = L.forward(params, ids, cfg, cache=cache, start_pos=0)
        return np.asarray(logits, np.float32)

    whole = prefill()  # G=2, T=12 -> one kernel call
    monkeypatch.setattr(flash_cached, "GT_MAX", 8)  # forces Tc_max=4 -> 3 chunks
    chunked = prefill()
    np.testing.assert_array_equal(whole, chunked)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.parametrize("int8", [False, True], ids=["bf16kv", "int8kv"])
def test_flash_tp_wrappers_match_single_device(int8):
    """The shard_map TP wrappers (KV heads over 'model', batch over 'data')
    produce BIT-identical outputs to the unmapped kernels — the multi-device
    serving attention path (VERDICT r3 item 3; BASELINE config #5).  The
    per-head online-softmax recurrences are device-local, so no collective
    enters the mapped body and exactness is structural, not numerical."""
    from bitsandbytes_tpu import parallel as par
    from bitsandbytes_tpu.ops.pallas.flash_cached import (
        flash_attention_cached_tp,
        flash_attention_paged,
        flash_attention_paged_tp,
    )

    mesh = par.make_mesh({"data": 2, "model": 4})
    Bt, KVHt, Gt, BS = 4, 4, 2, 64
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (Bt, KVHt, Gt, HD), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (Bt, KVHt, S, HD), jnp.float32)
    v = jax.random.normal(ks[2], (Bt, KVHt, S, HD), jnp.float32)
    if int8:
        ksc = jnp.max(jnp.abs(k), axis=-1) / 127.0
        vsc = jnp.max(jnp.abs(v), axis=-1) / 127.0
        kq = jnp.round(k / ksc[..., None]).astype(jnp.int8)
        vq = jnp.round(v / vsc[..., None]).astype(jnp.int8)
    else:
        kq, vq, ksc, vsc = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), None, None
    lengths = jnp.asarray([3, 100, 200, 255], jnp.int32)

    ref = flash_attention_cached(q, kq, vq, lengths, T=1, k_scale=ksc, v_scale=vsc)
    got = flash_attention_cached_tp(mesh, q, kq, vq, lengths, T=1, k_scale=ksc, v_scale=vsc)
    assert (np.asarray(ref) == np.asarray(got)).all()

    # paged: scatter the cache into a shuffled block pool
    NB, MAXB = Bt * (S // BS) + 3, S // BS
    perm = np.random.default_rng(0).permutation(NB)[: Bt * MAXB]
    tables = jnp.asarray(perm.reshape(Bt, MAXB), jnp.int32)
    pool_shape = (NB, KVHt, BS, HD)
    pk = jnp.zeros(pool_shape, kq.dtype)
    pv = jnp.zeros(pool_shape, vq.dtype)
    pks = jnp.zeros(pool_shape[:-1], jnp.float32) if int8 else None
    pvs = jnp.zeros(pool_shape[:-1], jnp.float32) if int8 else None
    for b in range(Bt):
        for j in range(MAXB):
            blk = int(tables[b, j])
            sl = slice(j * BS, (j + 1) * BS)
            pk = pk.at[blk].set(kq[b, :, sl])
            pv = pv.at[blk].set(vq[b, :, sl])
            if int8:
                pks = pks.at[blk].set(ksc[b, :, sl])
                pvs = pvs.at[blk].set(vsc[b, :, sl])
    ref_p = flash_attention_paged(q, pk, pv, tables, lengths, T=1, k_scale=pks, v_scale=pvs)
    got_p = flash_attention_paged_tp(mesh, q, pk, pv, tables, lengths, T=1, k_scale=pks, v_scale=pvs)
    assert (np.asarray(ref_p) == np.asarray(got_p)).all()
    # and the paged walk agrees with the contiguous cache (same tokens route)
    ref_c = flash_attention_cached(q, kq, vq, lengths, T=1, k_scale=ksc, v_scale=vsc)
    np.testing.assert_allclose(
        np.asarray(ref_p, np.float32), np.asarray(ref_c, np.float32), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("int8", [False, True], ids=["bf16kv", "int8kv"])
@pytest.mark.parametrize("BS", [64, 128], ids=["bs64", "bs128"])
def test_flash_paged_matches_dense_single_device(int8, BS):
    """Paged kernel vs the dense oracle on ONE device (the TP variant of
    this check needs an 8-device mesh and skips on the real chip) —
    exercises the F-block fused fetch (F = min(512//BS, MAXB) > 1 at these
    block sizes): table-walking BlockSpecs, the VMEM tile concat, and the
    2-D scale-row path in _flash_step."""
    from bitsandbytes_tpu.ops.pallas.flash_cached import (
        flash_attention_paged,
        flash_paged_supported,
    )

    assert flash_paged_supported(BS, HD, G)
    q, k, v, ksc, vsc = _mk(jax.random.PRNGKey(11), int8)
    lengths = jnp.asarray([5, S - 1], jnp.int32)

    # scatter the contiguous cache into a shuffled block pool
    MAXB = S // BS
    NB = B * MAXB + 3  # a few spare blocks so tables aren't the identity
    perm = np.random.default_rng(1).permutation(NB)[: B * MAXB]
    tables = jnp.asarray(perm.reshape(B, MAXB), jnp.int32)
    pk = jnp.zeros((NB, KVH, BS, HD), k.dtype)
    pv = jnp.zeros((NB, KVH, BS, HD), v.dtype)
    pks = jnp.zeros((NB, KVH, BS), jnp.float32) if int8 else None
    pvs = jnp.zeros((NB, KVH, BS), jnp.float32) if int8 else None
    for b in range(B):
        for j in range(MAXB):
            blk = int(tables[b, j])
            sl = slice(j * BS, (j + 1) * BS)
            pk = pk.at[blk].set(k[b, :, sl])
            pv = pv.at[blk].set(v[b, :, sl])
            if int8:
                pks = pks.at[blk].set(ksc[b, :, sl])
                pvs = pvs.at[blk].set(vsc[b, :, sl])

    out = flash_attention_paged(q, pk, pv, tables, lengths, T=1, k_scale=pks, v_scale=pvs)
    if int8:
        kf = np.asarray(k, np.float32) * np.asarray(ksc)[..., None]
        vf = np.asarray(v, np.float32) * np.asarray(vsc)[..., None]
    else:
        kf, vf = np.asarray(k, np.float32), np.asarray(v, np.float32)
    ref = dense_ref(np.asarray(q, np.float32), kf, vf, np.asarray(lengths), T=1)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.02, rtol=0.02)
