"""GPT-2/OPT-family transformer on the quantized compute path.

Second model family (BASELINE.json config #1 is OPT-125M LLM.int8()
inference; reference examples/int8_inference_huggingface.py): pre-LayerNorm
blocks, learned positional embeddings, full multi-head attention, GELU MLP.
Shares the weight-leaf dispatch (fp / QuantizedTensor / Int8TensorState)
with the Llama family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .llama import KVCache, _apply_linear, _attention
from ..nn.modules import Int8TensorState, QuantizedTensor

__all__ = [
    "GPT2Config",
    "init_params",
    "forward",
    "quantize_params_4bit",
    "quantize_params_int8",
]


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50304  # padded to a lane multiple (50257 in HF)
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 1024
    ln_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def opt125m(cls) -> "GPT2Config":
        return cls()

    @classmethod
    def tiny(cls) -> "GPT2Config":
        return cls(
            vocab_size=512,
            hidden_size=256,
            intermediate_size=512,
            num_layers=2,
            num_heads=4,
            max_positions=64,
        )


def init_params(key: jax.Array, cfg: GPT2Config) -> dict:
    D, F = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(key, cfg.num_layers + 3)

    def dense(k, n, m):
        return (jax.random.normal(k, (n, m), jnp.float32) * (m**-0.5)).astype(cfg.dtype)

    def layer(k):
        ks = jax.random.split(k, 4)
        return {
            "ln1_scale": jnp.ones((D,), cfg.dtype),
            "ln1_bias": jnp.zeros((D,), cfg.dtype),
            "wqkv": dense(ks[0], 3 * D, D),
            "wo": dense(ks[1], D, D),
            "ln2_scale": jnp.ones((D,), cfg.dtype),
            "ln2_bias": jnp.zeros((D,), cfg.dtype),
            "fc_in": dense(ks[2], F, D),
            "fc_out": dense(ks[3], D, F),
        }

    return {
        "embed": dense(keys[0], cfg.vocab_size, D),
        "pos_embed": dense(keys[1], cfg.max_positions, D),
        "layers": [layer(keys[i + 2]) for i in range(cfg.num_layers)],
        "final_ln_scale": jnp.ones((D,), cfg.dtype),
        "final_ln_bias": jnp.zeros((D,), cfg.dtype),
    }


_LINEARS = ("wqkv", "wo", "fc_in", "fc_out")


def quantize_params_4bit(params, quant_type="nf4", blocksize=64, compress_statistics=False):
    def q(W):
        return QuantizedTensor.quantize(
            jnp.asarray(W, jnp.float32),
            blocksize=blocksize,
            quant_type=quant_type,
            compress_statistics=compress_statistics,
        )

    out = dict(params)
    out["layers"] = [
        {k: (q(v) if k in _LINEARS else v) for k, v in layer.items()}
        for layer in params["layers"]
    ]
    return out


def quantize_params_int8(params):
    def q(W):
        return Int8TensorState.quantize(jnp.asarray(W, jnp.float32))

    out = dict(params)
    out["layers"] = [
        {k: (q(v) if k in _LINEARS else v) for k, v in layer.items()}
        for layer in params["layers"]
    ]
    return out


def _layernorm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale + bias


def forward(
    params: dict,
    ids: jax.Array,
    cfg: GPT2Config,
    int8_threshold: float = 0.0,
):
    """Causal forward over ids [B, T] (tied lm_head = embedding matrix,
    GPT-2 convention).  Returns logits [B, T, V]."""
    B, T = ids.shape
    H, hd = cfg.num_heads, cfg.head_dim
    x = jnp.take(params["embed"], ids, axis=0).astype(cfg.dtype)
    x = x + params["pos_embed"][None, :T]
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    valid = jnp.ones((B, T), bool)

    for layer in params["layers"]:
        h = _layernorm(x, layer["ln1_scale"], layer["ln1_bias"], cfg.ln_eps)
        qkv = _apply_linear(h, layer["wqkv"], None, int8_threshold)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        v = v.reshape(B, T, H, hd)
        # full MHA: reuse the GQA attention with groups == 1
        attn = _attention(q, k, v, positions, valid, _AttnCfg(H))
        x = x + _apply_linear(attn, layer["wo"], None, int8_threshold)

        h = _layernorm(x, layer["ln2_scale"], layer["ln2_bias"], cfg.ln_eps)
        h = _apply_linear(h, layer["fc_in"], None, int8_threshold)
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(x.dtype)
        x = x + _apply_linear(h, layer["fc_out"], None, int8_threshold)

    x = _layernorm(x, params["final_ln_scale"], params["final_ln_bias"], cfg.ln_eps)
    logits = _apply_linear(x, params["embed"], None, int8_threshold)
    return logits.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class _AttnCfg:
    num_kv_heads: int
