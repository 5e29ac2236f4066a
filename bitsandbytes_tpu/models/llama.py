"""Llama-family transformer on the quantized compute path.

The flagship model for the framework's serving/training slices
(BASELINE.json configs #2-#5: NF4 decode, LLM.int8() inference, QLoRA
finetune).  The reference library has no model zoo — it integrates with HF
Transformers (reference examples/int8_inference_huggingface.py:1-20) — but a
TPU-native framework serves models directly, so the model is a first-class,
purely-functional citizen:

* params are a plain pytree whose linear-weight leaves may be fp arrays,
  :class:`~bitsandbytes_tpu.nn.QuantizedTensor` (NF4/FP4 packed), or
  :class:`~bitsandbytes_tpu.nn.Int8TensorState` (LLM.int8()) — the forward
  dispatches per-leaf, exactly as HF swaps nn.Linear for bnb.nn.Linear4bit
  (reference utils.py:121-163 `replace_linear`).
* the decode step is a single jitted function over a static-shape KV cache
  (XLA-friendly: no dynamic shapes, `lax.dynamic_update_slice` writes).
* QLoRA: frozen quantized base + trainable low-rank adapters, trained with
  the 8-bit blockwise optimizers (reference QLoRA flow: autograd/_functions
  .py:300-386 MatMul4Bit with no weight grad).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import autograd
from ..functional.quant_state import QuantState
from ..nn.modules import Int8TensorState, QuantizedTensor

__all__ = [
    "LlamaConfig",
    "KVCache",
    "Int8KVCache",
    "PagedKVCache",
    "init_params",
    "init_kv_cache",
    "init_paged_kv_cache",
    "forward",
    "prefill",
    "decode_step",
    "quantize_params_4bit",
    "quantize_params_int8",
    "add_lora",
    "lora_train_step",
]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Architecture hyperparameters for the Llama-family decoder stack.

    The config also expresses the Llama-adjacent families the quantized
    stack serves (the reference serves them all through HF Transformers;
    here they are first-class):

    * Mistral: ``sliding_window`` (local attention span)
    * Qwen2: ``attn_bias`` (biases on the q/k/v projections)
    * Gemma: ``act="gelu"``, ``norm_plus_one`` ((1 + w) RMSNorm weights),
      ``scale_embed`` (sqrt(hidden) embedding multiplier)
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    sliding_window: Optional[int] = None
    attn_bias: bool = False
    act: str = "silu"
    norm_plus_one: bool = False
    scale_embed: bool = False

    @classmethod
    def llama3_8b(cls, num_layers: int = 32) -> "LlamaConfig":
        return cls(num_layers=num_layers)

    @classmethod
    def llama3_70b(cls, num_layers: int = 80) -> "LlamaConfig":
        """Llama-3.1-70B geometry (BASELINE 70B rows).  At ~35 GB NF4 this
        exceeds one v5e's HBM — serve it TP-sharded over a mesh (the
        packed-payload N-sharding rules in parallel/sharding.py); the
        per-chip working set at tp=4 is ~9 GB."""
        return cls(
            hidden_size=8192,
            intermediate_size=28672,
            num_heads=64,
            num_kv_heads=8,
            num_layers=num_layers,
        )

    @classmethod
    def llama2_7b(cls, num_layers: int = 32) -> "LlamaConfig":
        return cls(
            intermediate_size=11008,
            num_kv_heads=32,
            rope_theta=10000.0,
            num_layers=num_layers,
        )

    @classmethod
    def mistral_7b(cls, num_layers: int = 32) -> "LlamaConfig":
        return cls(
            intermediate_size=14336,
            num_kv_heads=8,
            rope_theta=10000.0,
            num_layers=num_layers,
            sliding_window=4096,
        )

    @classmethod
    def qwen2_7b(cls, num_layers: int = 28) -> "LlamaConfig":
        return cls(
            vocab_size=152064,
            hidden_size=3584,
            intermediate_size=18944,
            num_heads=28,
            num_kv_heads=4,
            rope_theta=1000000.0,
            num_layers=num_layers,
            attn_bias=True,
        )

    @classmethod
    def qwen25_32b(cls, num_layers: int = 64) -> "LlamaConfig":
        """Qwen2.5-32B geometry (BASELINE Qwen2.5-32B rows)."""
        return cls(
            vocab_size=152064,
            hidden_size=5120,
            intermediate_size=27648,
            num_heads=40,
            num_kv_heads=8,
            rope_theta=1000000.0,
            num_layers=num_layers,
            attn_bias=True,
        )

    @classmethod
    def gemma_7b(cls, num_layers: int = 28) -> "LlamaConfig":
        return cls(
            vocab_size=256000,
            hidden_size=3072,
            intermediate_size=24576,
            num_heads=16,
            num_kv_heads=16,
            head_dim=256,
            rope_theta=10000.0,
            num_layers=num_layers,
            act="gelu",
            norm_plus_one=True,
            scale_embed=True,
        )

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        """Test-size config; dims still satisfy the fused-kernel tiling
        (K % 256 == 0, N % 128 == 0)."""
        return cls(
            vocab_size=512,
            hidden_size=256,
            intermediate_size=512,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=64,
        )


class KVCache(NamedTuple):
    """Static-shape KV cache: ``k``/``v`` are [L, B, KVH, S, hd].

    The sequence dimension sits next to head_dim so the flash cached-
    attention kernel (ops/pallas/flash_cached.py) reads ``[SB, hd]`` blocks
    with hardware-native (sublane, lane) tiling — no per-step transposes."""

    k: jax.Array
    v: jax.Array


class Int8KVCache(NamedTuple):
    """int8-quantized KV cache: halves KV memory/bandwidth vs bf16.

    ``k``/``v`` are int8 [L, B, KVH, S, hd]; ``k_scale``/``v_scale`` are the
    per-(slot, head, position) absmax/127 scales [L, B, KVH, S].  This is
    the int8-KV serving option from BASELINE.json config #5 — a capability
    layered above the core quantization ops (SURVEY.md §5.7).  The flash
    kernel consumes the int8 payload directly (scales applied post-dot);
    the cache is never dequantized wholesale."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array


class PagedKVCache(NamedTuple):
    """Block-table (paged) KV cache (SURVEY.md §6 "paged/blocked KV").

    ``k``/``v`` are a shared physical pool [L, NB, KVH, BS, hd] (bf16 or
    int8 with ``k_scale``/``v_scale`` [L, NB, KVH, BS]); ``tables``
    [B, MAXB] int32 maps each slot's logical block j to a pool block, and
    entries past a slot's live length are clamped duplicates of its last
    live block (the attention kernel skips both their DMA and compute).
    Memory scales with NB (committed tokens), not batch x max_len.  The
    engine owns allocation (serving/paged.py); decode writes and attention
    walk the table on-device (ops/pallas/flash_cached.flash_attention_paged).
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    tables: jax.Array


def init_paged_kv_cache(
    cfg: LlamaConfig,
    batch: int,
    max_len: int,
    num_blocks: int,
    block_size: int = 128,
    kv_dtype="bf16",
) -> PagedKVCache:
    max_blocks = -(-max_len // block_size)
    shape = (cfg.num_layers, num_blocks, cfg.num_kv_heads, block_size, cfg.head_dim)
    int8 = kv_dtype in ("int8", jnp.int8)
    dt = jnp.int8 if int8 else cfg.dtype
    return PagedKVCache(
        k=jnp.zeros(shape, dt),
        v=jnp.zeros(shape, dt),
        k_scale=jnp.zeros(shape[:-1], jnp.float32) if int8 else None,
        v_scale=jnp.zeros(shape[:-1], jnp.float32) if int8 else None,
        tables=jnp.zeros((batch, max_blocks), jnp.int32),
    )


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, kv_dtype="bf16"):
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if kv_dtype in ("int8", jnp.int8):
        return Int8KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype=cfg.dtype), v=jnp.zeros(shape, dtype=cfg.dtype)
    )


def _quantize_kv(x):
    """Per-(batch, head, pos) symmetric int8 over the head dim.  Takes
    ``[B, KVH, T, hd]``; returns (int8, scale [B, KVH, T])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = absmax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale[..., None], 1e-12))
    return q.astype(jnp.int8), scale


def init_params(key: jax.Array, cfg: LlamaConfig) -> dict:
    """Random fp init (for benchmarks/tests; real weights come from
    checkpoint import)."""
    D = cfg.hidden_size
    H, KVH, hd, F = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.intermediate_size
    keys = jax.random.split(key, cfg.num_layers + 2)

    def dense(k, n, m):
        return (jax.random.normal(k, (n, m), jnp.float32) * (m**-0.5)).astype(cfg.dtype)

    def layer(k):
        ks = jax.random.split(k, 7)
        # norm_plus_one (Gemma) stores norm weights centered at 0: (1 + w)
        norm_init = jnp.zeros if cfg.norm_plus_one else jnp.ones
        out = {
            "attn_norm": norm_init((D,), cfg.dtype),
            "wq": dense(ks[0], H * hd, D),
            "wk": dense(ks[1], KVH * hd, D),
            "wv": dense(ks[2], KVH * hd, D),
            "wo": dense(ks[3], D, H * hd),
            "mlp_norm": norm_init((D,), cfg.dtype),
            "gate": dense(ks[4], F, D),
            "up": dense(ks[5], F, D),
            "down": dense(ks[6], D, F),
        }
        if cfg.attn_bias:  # Qwen2: biases on q/k/v only
            out["wq_b"] = jnp.zeros((H * hd,), cfg.dtype)
            out["wk_b"] = jnp.zeros((KVH * hd,), cfg.dtype)
            out["wv_b"] = jnp.zeros((KVH * hd,), cfg.dtype)
        return out

    return {
        "embed": dense(keys[0], cfg.vocab_size, D),
        "layers": [layer(keys[i + 1]) for i in range(cfg.num_layers)],
        "final_norm": (jnp.zeros if cfg.norm_plus_one else jnp.ones)((D,), cfg.dtype),
        "lm_head": dense(keys[-1], cfg.vocab_size, D),
    }


_LINEAR_NAMES = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_params_4bit(
    params: dict,
    quant_type: str = "nf4",
    blocksize: int = 64,
    compress_statistics: bool = False,
    quantize_lm_head: bool = False,
    fuse: bool = False,
) -> dict:
    """Replace every layer linear weight with a packed 4-bit QuantizedTensor
    (the `replace_linear` analog, reference utils.py:121-163; HF skips
    lm_head by default — `llm_int8_skip_modules`).

    ``fuse=True`` concatenates q/k/v into one ``wqkv`` weight and gate/up
    into ``gate_up`` before quantizing (rows are independent quant blocks,
    so fused quantization is bit-identical to separate): one fused
    dequant+GEMM kernel launch instead of three/two on the decode path.
    """

    def q(W):
        return QuantizedTensor.quantize(
            jnp.asarray(W, jnp.float32),
            blocksize=blocksize,
            quant_type=quant_type,
            compress_statistics=compress_statistics,
        )

    def qlayer(layer):
        if not fuse:
            return {k: (q(v) if k in _LINEAR_NAMES else v) for k, v in layer.items()}
        out = {
            "attn_norm": layer["attn_norm"],
            "mlp_norm": layer["mlp_norm"],
            "wqkv": q(jnp.concatenate([layer["wq"], layer["wk"], layer["wv"]], axis=0)),
            "wo": q(layer["wo"]),
            "gate_up": q(jnp.concatenate([layer["gate"], layer["up"]], axis=0)),
            "down": q(layer["down"]),
        }
        if "wq_b" in layer:  # Qwen2: fuse the q/k/v biases too
            out["wqkv_b"] = jnp.concatenate(
                [layer["wq_b"], layer["wk_b"], layer["wv_b"]], axis=0
            )
        return out

    out = dict(params)
    out["layers"] = [qlayer(layer) for layer in params["layers"]]
    if quantize_lm_head:
        out["lm_head"] = q(params["lm_head"])
    return out


def quantize_params_int8(params: dict, quantize_lm_head: bool = False) -> dict:
    """Replace layer linear weights with LLM.int8() CB/SCB states."""

    def q(W):
        return Int8TensorState.quantize(jnp.asarray(W, jnp.float32))

    out = dict(params)
    out["layers"] = [
        {k: (q(v) if k in _LINEAR_NAMES else v) for k, v in layer.items()}
        for layer in params["layers"]
    ]
    if quantize_lm_head:
        out["lm_head"] = q(params["lm_head"])
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _apply_linear(x, w, lora=None, threshold: float = 0.0):
    """Dispatch on the weight leaf type; optionally add a LoRA delta."""
    if isinstance(w, QuantizedTensor):
        out = autograd.matmul_4bit(x, w.data, w.state)
    elif isinstance(w, Int8TensorState):
        state = autograd.MatmulLtState(CB=w.CB, SCB=w.SCB, threshold=threshold)
        out = autograd.matmul(x, None, state)
    else:
        # dot_general contracting x's K with W[N, K]'s dim 1: no transpose
        # materialization (w.T would copy the full weight every step).
        out = jax.lax.dot_general(
            x,
            w.astype(x.dtype),
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if lora is not None:
        # x @ A^T @ B^T * (alpha/r)   (QLoRA adapters; arXiv:2305.14314)
        h = jnp.matmul(x, lora["a"].T.astype(x.dtype))
        out = out + jnp.matmul(h, lora["b"].T.astype(x.dtype)) * lora["scale"]
    return out


def _rmsnorm(x, w, eps, plus_one: bool = False):
    x32 = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    if plus_one:  # Gemma stores weights as (w - 1)
        return (x32 * rms).astype(x.dtype) * (1.0 + w.astype(jnp.float32)).astype(x.dtype)
    return (x32 * rms).astype(x.dtype) * w


def _rope(x, positions, theta):
    """x: [B, T, H, hd]; positions: [B, T] int32."""
    hd = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, hd // 2, dtype=jnp.float32) / (hd // 2))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, hd/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(
        x.dtype
    )


def _flash_ok(cfg, T: int, hd: int) -> bool:
    """Route the no-cache causal path through the Pallas TPU flash-attention
    kernel (jax.experimental.pallas.ops.tpu.flash_attention): no [B, H, T, T]
    f32 score materialization — at T=512 that is 134 MB/layer/direction of
    HBM traffic the blockwise recurrence never pays.  TPU-only (the upstream
    kernel has no interpret path) and full-causal only (sliding windows and
    cache decoding keep the masked dense path).

    Measured on v5e (4-layer 8B QLoRA step): neutral at T in 512..2048, and
    at T=8192 the dense path FAILS TO COMPILE (the [B, H, T, T] f32 score
    transient is 8.6 GB/layer) while flash trains at 15k tok/s — the
    threshold is a memory-safety line, not a speed crossover."""
    import jax as _jax

    return (
        _jax.default_backend() not in ("cpu", "gpu")
        and getattr(cfg, "sliding_window", None) is None
        and T >= 1024
        and T % 128 == 0
        and hd % 128 == 0
    )


@functools.lru_cache(maxsize=None)
def _flash_call(sm_scale: float):
    """Precision-pinned wrapper of the upstream flash kernel: a global
    'highest' default matmul precision (e.g. the test harness's) makes
    Mosaic reject the kernel's bf16 dots.  The context must cover BOTH
    traces — the backward is traced during jax.grad, outside any context at
    the call site — hence the custom_vjp with the context re-entered in
    each rule."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    def run(qt, kt, vt):
        return _fa.flash_attention(qt, kt, vt, causal=True, sm_scale=sm_scale)

    @jax.custom_vjp
    def call(qt, kt, vt):
        with jax.default_matmul_precision("default"):
            return run(qt, kt, vt)

    def fwd(qt, kt, vt):
        with jax.default_matmul_precision("default"):
            out, vjp = jax.vjp(run, qt, kt, vt)
        return out, vjp

    def bwd(vjp, g):
        with jax.default_matmul_precision("default"):
            return vjp(g)

    call.defvjp(fwd, bwd)
    return call


def _flash_attention_causal(q, k, v, cfg):
    """q [B, T, H, hd], k/v [B, T, KVH, hd] -> [B, T, H*hd] via the Pallas
    flash kernel (differentiable custom-VJP upstream)."""
    B, T, H, hd = q.shape
    groups = H // cfg.num_kv_heads
    k = jnp.repeat(k, groups, axis=2)
    v = jnp.repeat(v, groups, axis=2)
    # kernel layout: [batch, heads, seq, head_dim]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _flash_call(hd**-0.5)(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2).reshape(B, T, H * hd)


def _attention(q, k, v, q_positions, kv_len_mask, cfg):
    """q: [B, T, H, hd]; k/v: [B, S, KVH, hd]; kv_len_mask: [B, S] bool of
    valid cache slots; q_positions: [B, T] absolute positions for causality.
    ``cfg.sliding_window`` (Mistral) restricts attention to the last
    ``window`` positions.
    """
    B, T, H, hd = q.shape
    S = k.shape[1]
    groups = H // cfg.num_kv_heads
    k = jnp.repeat(k, groups, axis=2)
    v = jnp.repeat(v, groups, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd**-0.5)
    kv_positions = jnp.arange(S)[None, None, None, :]  # cache slot s holds pos s
    causal = kv_positions <= q_positions[:, None, :, None]
    mask = causal & kv_len_mask[:, None, None, :]
    window = getattr(cfg, "sliding_window", None)  # duck-typed cfgs (gpt2)
    if window is not None:
        recent = kv_positions > q_positions[:, None, :, None] - window
        mask = mask & recent
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v)
    return out.reshape(B, T, H * hd)


def forward(
    params: dict,
    ids: jax.Array,
    cfg: LlamaConfig,
    cache: Optional[KVCache] = None,
    start_pos: int | jax.Array = 0,
    lora: Optional[dict] = None,
    int8_threshold: float = 0.0,
    return_hidden: bool = False,
    mesh=None,
):
    """Run the transformer over ``ids`` [B, T].

    Without a cache this is a plain causal forward (training / one-shot
    prefill).  With a cache, K/V for these positions are written at
    ``start_pos`` and attention runs against the whole cache (serving).
    Returns ``(logits [B, T, V], new_cache)`` — or the final-norm hidden
    states ``[B, T, D]`` instead of logits when ``return_hidden`` (the
    chunked-loss path applies the lm_head itself, per token chunk).

    ``mesh``: optional `jax.sharding.Mesh` for multi-device serving.  The
    dense jnp ops partition via GSPMD on their input shardings alone, but
    Pallas kernels do not auto-partition — with a mesh, the flash cached/
    paged attention calls run under ``shard_map`` with KV heads split over
    the ``model`` axis (and batch over ``data``; see
    ops/pallas/flash_cached.py TP wrappers).  Pass it statically (Mesh is
    hashable) from jitted callers — the serving engine does.
    """
    B, T = ids.shape
    H, KVH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = jnp.take(params["embed"], ids, axis=0).astype(cfg.dtype)
    if cfg.scale_embed:  # Gemma multiplies embeddings by sqrt(hidden)
        x = x * jnp.asarray(cfg.hidden_size**0.5, cfg.dtype)
    start_pos = jnp.asarray(start_pos)
    vector_pos = start_pos.ndim == 1  # per-slot positions (continuous batching)
    if vector_pos and T != 1:
        raise ValueError("per-slot start_pos requires T == 1 (decode)")
    if vector_pos:
        positions = start_pos[:, None]
    else:
        positions = start_pos + jnp.arange(T)[None, :]
        positions = jnp.broadcast_to(positions, (B, T))

    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        l_lora = lora["layers"][li] if lora is not None else {}
        h = _rmsnorm(x, layer["attn_norm"], cfg.rms_eps, cfg.norm_plus_one)
        if "wqkv" in layer:
            qkv = _apply_linear(h, layer["wqkv"], None, int8_threshold)
            if "wqkv_b" in layer:
                qkv = qkv + layer["wqkv_b"].astype(qkv.dtype)
            q, k, v = jnp.split(qkv, [H * hd, (H + KVH) * hd], axis=-1)
            # LoRA deltas for the fused projections apply post-split
            for name_, dst in (("wq", "q"), ("wk", "k"), ("wv", "v")):
                lo = l_lora.get(name_)
                if lo is not None:
                    hh = jnp.matmul(h, lo["a"].T.astype(h.dtype))
                    delta = jnp.matmul(hh, lo["b"].T.astype(h.dtype)) * lo["scale"]
                    if dst == "q":
                        q = q + delta
                    elif dst == "k":
                        k = k + delta
                    else:
                        v = v + delta
            q = q.reshape(B, T, H, hd)
            k = k.reshape(B, T, KVH, hd)
            v = v.reshape(B, T, KVH, hd)
        else:
            q = _apply_linear(h, layer["wq"], l_lora.get("wq"), int8_threshold)
            k = _apply_linear(h, layer["wk"], l_lora.get("wk"), int8_threshold)
            v = _apply_linear(h, layer["wv"], l_lora.get("wv"), int8_threshold)
            if "wq_b" in layer:  # Qwen2 q/k/v biases
                q = q + layer["wq_b"].astype(q.dtype)
                k = k + layer["wk_b"].astype(k.dtype)
                v = v + layer["wv_b"].astype(v.dtype)
            q = q.reshape(B, T, H, hd)
            k = k.reshape(B, T, KVH, hd)
            v = v.reshape(B, T, KVH, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        if isinstance(cache, PagedKVCache):
            if not vector_pos:
                raise ValueError(
                    "PagedKVCache supports per-slot decode (T == 1) only; "
                    "prefill through a dense cache and pack the blocks "
                    "(the serving engine does this)"
                )
            is_int8_kv = cache.k_scale is not None
            k_t = jnp.swapaxes(k, 1, 2)  # [B, KVH, 1, hd]
            v_t = jnp.swapaxes(v, 1, 2)
            if is_int8_kv:
                k_w, k_s = _quantize_kv(k_t)
                v_w, v_s = _quantize_kv(v_t)
            else:
                k_w, v_w = k_t.astype(cache.k.dtype), v_t.astype(cache.v.dtype)
            BSz = cache.k.shape[3]
            ar = jnp.arange(B)
            blk = cache.tables[ar, start_pos // BSz]
            off = start_pos % BSz
            ck = cache.k[li].at[blk, :, off].set(k_w[:, :, 0])
            cv = cache.v[li].at[blk, :, off].set(v_w[:, :, 0])
            new_k.append(ck)
            new_v.append(cv)
            if is_int8_kv:
                cks = cache.k_scale[li].at[blk, :, off].set(k_s[:, :, 0])
                cvs = cache.v_scale[li].at[blk, :, off].set(v_s[:, :, 0])
                new_ks.append(cks)
                new_vs.append(cvs)
            from ..ops import dispatch as _dispatch
            from ..ops.pallas.flash_cached import (
                flash_attention_paged,
                flash_attention_paged_tp,
                flash_paged_supported,
            )

            G = H // KVH
            if _dispatch.use_pallas() and flash_paged_supported(BSz, hd, G):
                qf = q.transpose(0, 2, 1, 3).reshape(B, KVH, G, hd)
                if mesh is not None:
                    attn_f = flash_attention_paged_tp(
                        mesh, qf, ck, cv, cache.tables, start_pos, T=1,
                        k_scale=cks if is_int8_kv else None,
                        v_scale=cvs if is_int8_kv else None,
                        window=cfg.sliding_window,
                    )
                else:
                    attn_f = flash_attention_paged(
                        qf, ck, cv, cache.tables, start_pos, T=1,
                        k_scale=cks if is_int8_kv else None,
                        v_scale=cvs if is_int8_kv else None,
                        window=cfg.sliding_window,
                    )
                attn = (
                    attn_f.reshape(B, KVH, G, 1, hd)
                    .transpose(0, 3, 1, 2, 4)
                    .reshape(B, T, H * hd)
                )
            else:
                # dense oracle fallback (reference-tier dispatch, or shapes
                # the paged kernel can't tile, e.g. hd % 128 != 0): gather
                # each slot's logical cache out of the block pool
                def gather(pool):
                    g = jnp.take(pool, cache.tables, axis=0)  # [B, MAXB, KVH, BS, ...]
                    g = jnp.swapaxes(g, 1, 2)  # [B, KVH, MAXB, BS, ...]
                    return g.reshape(B, KVH, -1, *pool.shape[3:])

                kf, vf = gather(ck), gather(cv)
                if is_int8_kv:
                    kf = (kf.astype(jnp.float32) * gather(cks)[..., None]).astype(q.dtype)
                    vf = (vf.astype(jnp.float32) * gather(cvs)[..., None]).astype(q.dtype)
                else:
                    kf, vf = kf.astype(q.dtype), vf.astype(q.dtype)
                S_log = kf.shape[2]
                kf = jnp.swapaxes(kf, 1, 2)  # -> [B, S, KVH, hd]
                vf = jnp.swapaxes(vf, 1, 2)
                valid = jnp.arange(S_log)[None, :] <= start_pos[:, None]
                attn = _attention(q, kf, vf, positions, valid, cfg)
        elif cache is not None:
            is_int8_kv = isinstance(cache, Int8KVCache)
            # new K/V in cache orientation [B, KVH, T, hd]
            k_t = jnp.swapaxes(k, 1, 2)
            v_t = jnp.swapaxes(v, 1, 2)
            if is_int8_kv:
                k_w, k_s = _quantize_kv(k_t)
                v_w, v_s = _quantize_kv(v_t)
            else:
                k_w, v_w = k_t.astype(cache.k.dtype), v_t.astype(cache.v.dtype)
                k_s = v_s = None
            if vector_pos:
                # continuous batching: each slot writes at its own position
                ar = jnp.arange(B)
                ck = cache.k[li].at[ar, :, start_pos].set(k_w[:, :, 0])
                cv = cache.v[li].at[ar, :, start_pos].set(v_w[:, :, 0])
                if is_int8_kv:
                    cks = cache.k_scale[li].at[ar, :, start_pos].set(k_s[:, :, 0])
                    cvs = cache.v_scale[li].at[ar, :, start_pos].set(v_s[:, :, 0])
            else:
                ck = jax.lax.dynamic_update_slice(cache.k[li], k_w, (0, 0, start_pos, 0))
                cv = jax.lax.dynamic_update_slice(cache.v[li], v_w, (0, 0, start_pos, 0))
                if is_int8_kv:
                    cks = jax.lax.dynamic_update_slice(
                        cache.k_scale[li], k_s, (0, 0, start_pos)
                    )
                    cvs = jax.lax.dynamic_update_slice(
                        cache.v_scale[li], v_s, (0, 0, start_pos)
                    )
            new_k.append(ck)
            new_v.append(cv)
            if is_int8_kv:
                new_ks.append(cks)
                new_vs.append(cvs)
            S = ck.shape[2]
            # newest query token's absolute position, per slot
            if vector_pos:
                lengths = start_pos
            else:
                lengths = jnp.broadcast_to(start_pos + T - 1, (B,))
            from ..ops import dispatch as _dispatch
            from ..ops.pallas.flash_cached import (
                GT_MAX,
                flash_attention_cached,
                flash_attention_cached_tp,
                flash_cached_supported,
            )

            G = H // KVH
            Tc_max = max(1, GT_MAX // G)
            if _dispatch.use_pallas() and flash_cached_supported(
                min(T, Tc_max), S, hd, G
            ):
                # flash route (SURVEY §5.7(a)): blockwise online-softmax over
                # the cache; int8 KV consumed natively (scales post-dot) —
                # no [B, H, T, S] scores, no wholesale cache dequant.  Long
                # cached prefills are chunked over T so the folded q rows
                # stay within the kernel's VMEM scratch budget (GT_MAX).
                chunks = []
                for off in range(0, T, Tc_max):
                    Tc = min(Tc_max, T - off)
                    q_c = q[:, off : off + Tc]
                    qf = q_c.transpose(0, 2, 1, 3).reshape(B, KVH, G * Tc, hd)
                    if mesh is not None:
                        attn_f = flash_attention_cached_tp(
                            mesh, qf, ck, cv,
                            lengths - (T - 1) + (off + Tc - 1), T=Tc,
                            k_scale=cks if is_int8_kv else None,
                            v_scale=cvs if is_int8_kv else None,
                            window=cfg.sliding_window,
                        )
                    else:
                        attn_f = flash_attention_cached(
                            qf, ck, cv, lengths - (T - 1) + (off + Tc - 1), T=Tc,
                            k_scale=cks if is_int8_kv else None,
                            v_scale=cvs if is_int8_kv else None,
                            window=cfg.sliding_window,
                        )
                    chunks.append(attn_f.reshape(B, KVH, G, Tc, hd))
                attn_f = (
                    jnp.concatenate(chunks, axis=3) if len(chunks) > 1 else chunks[0]
                )
                attn = (
                    attn_f.transpose(0, 3, 1, 2, 4)
                    .reshape(B, T, H * hd)
                )
            else:
                # dense oracle path (reference semantics; CPU tier)
                if is_int8_kv:
                    k_full = (ck.astype(jnp.float32) * cks[..., None]).astype(q.dtype)
                    v_full = (cv.astype(jnp.float32) * cvs[..., None]).astype(q.dtype)
                else:
                    k_full, v_full = ck.astype(q.dtype), cv.astype(q.dtype)
                k_full = jnp.swapaxes(k_full, 1, 2)  # -> [B, S, KVH, hd]
                v_full = jnp.swapaxes(v_full, 1, 2)
                if vector_pos:
                    valid = jnp.arange(S)[None, :] <= start_pos[:, None]
                else:
                    valid = jnp.arange(S)[None, :] < (start_pos + T)
                    valid = jnp.broadcast_to(valid, (B, S))
                attn = _attention(q, k_full, v_full, positions, valid, cfg)
        else:
            # no cache = plain causal attention from position 0 (training /
            # one-shot forward): flash-kernel route when supported
            if (
                isinstance(start_pos, int) or start_pos.ndim == 0
            ) and _flash_ok(cfg, T, hd):
                attn = _flash_attention_causal(q, k, v, cfg)
            else:
                valid = jnp.ones((B, T), dtype=bool)
                attn = _attention(q, k, v, positions, valid, cfg)

        x = x + _apply_linear(attn, layer["wo"], l_lora.get("wo"), int8_threshold)

        h = _rmsnorm(x, layer["mlp_norm"], cfg.rms_eps, cfg.norm_plus_one)
        if "gate_up" in layer:
            gu = _apply_linear(h, layer["gate_up"], None, int8_threshold)
            gate, up = jnp.split(gu, 2, axis=-1)
            for name_, is_gate in (("gate", True), ("up", False)):
                lo = l_lora.get(name_)
                if lo is not None:
                    hh = jnp.matmul(h, lo["a"].T.astype(h.dtype))
                    delta = jnp.matmul(hh, lo["b"].T.astype(h.dtype)) * lo["scale"]
                    if is_gate:
                        gate = gate + delta
                    else:
                        up = up + delta
        else:
            gate = _apply_linear(h, layer["gate"], l_lora.get("gate"), int8_threshold)
            up = _apply_linear(h, layer["up"], l_lora.get("up"), int8_threshold)
        act_fn = jax.nn.silu if cfg.act == "silu" else (
            lambda v: jax.nn.gelu(v, approximate=True))
        x = x + _apply_linear(
            act_fn(gate.astype(jnp.float32)).astype(x.dtype) * up,
            layer["down"],
            l_lora.get("down"),
            int8_threshold,
        )

    x = _rmsnorm(x, params["final_norm"], cfg.rms_eps, cfg.norm_plus_one)
    if return_hidden:
        logits = x  # caller applies the lm_head (chunked loss)
    else:
        logits = _apply_linear(x, params["lm_head"], threshold=int8_threshold)
    if cache is not None:
        if isinstance(cache, PagedKVCache):
            new_cache = PagedKVCache(
                jnp.stack(new_k), jnp.stack(new_v),
                jnp.stack(new_ks) if new_ks else None,
                jnp.stack(new_vs) if new_vs else None,
                cache.tables,
            )
        elif isinstance(cache, Int8KVCache):
            new_cache = Int8KVCache(
                jnp.stack(new_k), jnp.stack(new_v),
                jnp.stack(new_ks), jnp.stack(new_vs),
            )
        else:
            new_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v))
        return (logits if return_hidden else logits.astype(jnp.float32)), new_cache
    return (logits if return_hidden else logits.astype(jnp.float32)), None


def prefill(params, ids, cfg, cache, lora=None):
    return forward(params, ids, cfg, cache=cache, start_pos=0, lora=lora)


def decode_step(params, token, cfg, cache, pos, lora=None):
    """One decode step: ``token`` [B] at absolute position ``pos`` (traced
    scalar).  Returns (logits [B, V], new_cache).  This is THE hot serving
    path — every linear hits the fused Pallas dequant+GEMV."""
    logits, cache = forward(
        params, token[:, None], cfg, cache=cache, start_pos=pos, lora=lora
    )
    return logits[:, 0], cache


# ---------------------------------------------------------------------------
# QLoRA training
# ---------------------------------------------------------------------------


def add_lora(
    key: jax.Array,
    cfg: LlamaConfig,
    rank: int = 8,
    alpha: float = 16.0,
    targets: tuple = ("wq", "wk", "wv", "wo"),
) -> dict:
    """Create a LoRA adapter tree matching the model layout (QLoRA,
    arXiv:2305.14314 — the training story for frozen 4-bit weights;
    reference MatMul4Bit computes no weight grad, autograd/_functions.py:
    364-386, so adapters are what trains)."""
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KVH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dims = {
        "wq": (H * hd, D),
        "wk": (KVH * hd, D),
        "wv": (KVH * hd, D),
        "wo": (D, H * hd),
        "gate": (F, D),
        "up": (F, D),
        "down": (D, F),
    }
    keys = jax.random.split(key, cfg.num_layers)

    def layer(k):
        out = {}
        for i, name in enumerate(targets):
            n, m = dims[name]
            ka = jax.random.fold_in(k, i)
            out[name] = {
                "a": jax.random.normal(ka, (rank, m), jnp.float32) * (m**-0.5),
                "b": jnp.zeros((n, rank), jnp.float32),
                "scale": jnp.asarray(alpha / rank, jnp.float32),
            }
        return out

    return {"layers": [layer(keys[i]) for i in range(cfg.num_layers)]}


def lm_loss(
    params,
    lora,
    ids,
    cfg,
    token_chunk: Optional[int] = None,
    int8_threshold: float = 0.0,
):
    """Next-token cross-entropy over ids [B, T+1].

    ``int8_threshold``: forwarded to :func:`forward` — enables LLM.int8()
    outlier decomposition on int8-quantized linears (reference
    autograd/_functions.py MatMul8bitLt threshold semantics).

    ``token_chunk``: compute the lm_head + softmax in chunks of that many
    tokens instead of materializing the full ``[B, T, V]`` logits (at
    Llama-3's 128k vocab, bs=4 x T=2048 logits alone are 4 GB f32 — more
    HBM than the whole 4-bit model).  The backward recomputes each chunk's
    logits (`jax.checkpoint`), trading one extra lm_head matmul for the
    logits' storage — the standard TPU memory/FLOPs trade for long-context
    training.  Loss is identical to the dense path up to f32 summation
    order — except under ``int8_threshold`` on an int8 lm_head, where the
    outlier column set is detected per chunk (reference MatMul8bitLt
    per-matmul semantics), so equality is semantic (~1e-5 relative), not
    bitwise."""
    if token_chunk is None:
        logits, _ = forward(
            params, ids[:, :-1], cfg, lora=lora, int8_threshold=int8_threshold
        )
        targets = ids[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.mean()

    h, _ = forward(
        params,
        ids[:, :-1],
        cfg,
        lora=lora,
        return_hidden=True,
        int8_threshold=int8_threshold,
    )
    D = h.shape[-1]
    h = h.reshape(-1, D)
    targets = ids[:, 1:].reshape(-1)
    N = h.shape[0]
    pad = (-N) % token_chunk
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        targets = jnp.concatenate(
            [targets, jnp.full((pad,), -1, targets.dtype)]
        )
    nchunks = (N + pad) // token_chunk
    h_c = h.reshape(nchunks, token_chunk, D)
    t_c = targets.reshape(nchunks, token_chunk)
    lm_head = params["lm_head"]

    @jax.checkpoint
    def body(total, xt):
        hc, tc = xt
        # threshold must follow the dense path (forward passes it too):
        # dropping it here silently disabled LLM.int8() outlier
        # decomposition on an int8 lm_head under token_chunk
        logits = _apply_linear(hc, lm_head, threshold=int8_threshold).astype(
            jnp.float32
        )  # [C, V]
        lse = jax.nn.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(
            logits, jnp.maximum(tc, 0)[:, None], axis=-1
        )[:, 0]
        nll = jnp.where(tc >= 0, lse - tl, 0.0)
        return total + nll.sum(), None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (h_c, t_c))
    return total / N


def lora_train_step(params, lora, opt_state, ids, cfg, optimizer, token_chunk=None):
    """One QLoRA step: grads flow only into the adapters; the 4-bit base is
    frozen (matching reference MatMul4Bit semantics).  ``token_chunk``
    chunks the lm_head/softmax (see :func:`lm_loss`) for long contexts."""
    loss, grads = jax.value_and_grad(
        lambda lo: lm_loss(params, lo, ids, cfg, token_chunk=token_chunk)
    )(lora)
    updates, opt_state = optimizer.update(grads, opt_state, lora)
    import optax

    lora = optax.apply_updates(lora, updates)
    return loss, lora, opt_state
