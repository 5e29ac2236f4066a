"""Mixture-of-Experts FFN on quantized expert weights + expert parallelism.

The reference's parametrize API exists to store MoE expert weights in 4-bit
(bitsandbytes/nn/parametrize.py docstring names MoE experts as the use
case); here the MoE layer itself is first-class and *expert-parallel*: the
stacked per-expert packed payloads/absmax shard over an ``expert`` mesh
axis, each device computes its local experts' contribution for all tokens,
and a ``psum`` combines — the `ep` axis of a dp/tp/pp/sp/ep mesh.

Routing is dense top-k (every expert computes, gates mask) — XLA-friendly
static shapes; capacity-based all_to_all dispatch is a later optimization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..functional.quant_state import QuantState
from ..nn.modules import QuantizedTensor
from .. import autograd

__all__ = ["init_moe_params", "moe_ffn", "moe_ffn_expert_parallel"]


def init_moe_params(
    key: jax.Array,
    hidden: int,
    ffn: int,
    n_experts: int,
    blocksize: int = 64,
    quant_type: str = "nf4",
) -> dict:
    """Router + stacked quantized expert FFNs (SwiGLU).

    Expert weight leaves are stacked along a leading expert axis:
    ``gate_up_data [E, 2*ffn, hidden/2]`` etc., plus one shared QuantState
    *template* (all experts share shape/blocksize/codebook; per-expert absmax
    is stacked alongside)."""
    keys = jax.random.split(key, n_experts + 1)
    router = jax.random.normal(keys[0], (n_experts, hidden), jnp.float32) * (hidden**-0.5)

    gu_data, gu_am, dn_data, dn_am = [], [], [], []
    template = {}
    for e in range(n_experts):
        k1, k2 = jax.random.split(keys[e + 1])
        Wgu = jax.random.normal(k1, (2 * ffn, hidden), jnp.float32) * (hidden**-0.5)
        Wdn = jax.random.normal(k2, (hidden, ffn), jnp.float32) * (ffn**-0.5)
        qgu = QuantizedTensor.quantize(Wgu, blocksize=blocksize, quant_type=quant_type)
        qdn = QuantizedTensor.quantize(Wdn, blocksize=blocksize, quant_type=quant_type)
        gu_data.append(qgu.data)
        gu_am.append(qgu.state.absmax)
        dn_data.append(qdn.data)
        dn_am.append(qdn.state.absmax)
        template = {
            "gate_up": (qgu.state.quant_type, qgu.state.blocksize, tuple(qgu.state.shape)),
            "down": (qdn.state.quant_type, qdn.state.blocksize, tuple(qdn.state.shape)),
        }
    params = {
        "router": router,
        "gate_up_data": jnp.stack(gu_data),
        "gate_up_absmax": jnp.stack(gu_am),
        "down_data": jnp.stack(dn_data),
        "down_absmax": jnp.stack(dn_am),
    }
    return params, template  # (array pytree, static meta)


def _expert_ffn(x, gu_data, gu_am, dn_data, dn_am, meta):
    qt, bs, shape = meta["gate_up"]
    st = QuantState.make(absmax=gu_am, shape=shape, quant_type=qt, blocksize=bs, dtype=x.dtype)
    gu = autograd.matmul_4bit(x, gu_data, st)
    g, u = jnp.split(gu, 2, axis=-1)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    qt2, bs2, shape2 = meta["down"]
    st2 = QuantState.make(absmax=dn_am, shape=shape2, quant_type=qt2, blocksize=bs2, dtype=x.dtype)
    return autograd.matmul_4bit(h, dn_data, st2)


def _gates(x, router, top_k):
    logits = jnp.einsum("bd,ed->be", x.astype(jnp.float32), router)
    if top_k < router.shape[0]:
        vals, _ = jax.lax.top_k(logits, top_k)
        thresh = vals[:, -1:]
        logits = jnp.where(logits >= thresh, logits, -jnp.inf)
    return jax.nn.softmax(logits, axis=-1)  # [B, E]


def moe_ffn(params: dict, meta: dict, x: jax.Array, top_k: int = 2) -> jax.Array:
    """Single-device dense MoE: every expert computes, gates combine."""
    B = x.shape[0]
    gates = _gates(x, params["router"], top_k)
    E = params["router"].shape[0]
    out = jnp.zeros((B, x.shape[-1]), jnp.float32)
    for e in range(E):
        y = _expert_ffn(
            x,
            params["gate_up_data"][e],
            params["gate_up_absmax"][e],
            params["down_data"][e],
            params["down_absmax"][e],
            meta,
        )
        out = out + gates[:, e : e + 1] * y.astype(jnp.float32)
    return out.astype(x.dtype)


def moe_ffn_expert_parallel(
    params: dict,
    meta: dict,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "expert",
    top_k: int = 2,
) -> jax.Array:
    """Expert-parallel MoE: stacked expert weights shard over ``axis``; each
    device computes its local experts for all tokens; psum combines."""
    E = params["router"].shape[0]
    n_shards = mesh.shape[axis]
    if E % n_shards:
        raise ValueError(f"{E} experts do not shard over {n_shards}")
    e_local = E // n_shards
    gates = _gates(x, params["router"], top_k)  # computed replicated

    def body(x, gates_shard, gu_d, gu_a, dn_d, dn_a):
        out = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)
        for e in range(e_local):
            y = _expert_ffn(x, gu_d[e], gu_a[e], dn_d[e], dn_a[e], meta)
            out = out + gates_shard[:, e : e + 1] * y.astype(jnp.float32)
        return jax.lax.psum(out, axis)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False,
    )(
        x,
        gates,
        params["gate_up_data"],
        params["gate_up_absmax"],
        params["down_data"],
        params["down_absmax"],
    )
    return out.astype(x.dtype)
