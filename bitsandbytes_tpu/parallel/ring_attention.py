"""Ring attention: exact attention over a sequence-sharded KV cache.

Long-context strategy from SURVEY.md §5.7: shard the sequence over a mesh
axis, rotate K/V blocks around the ring via ``ppermute`` while each device
accumulates its queries' attention with the online-softmax (flash)
recurrence.  Exact (not approximate) and memory-O(T/n) per device; ICI
traffic is one K/V block per step, overlapped by XLA with the block matmuls.

The reference library has no attention ops at all (sequence length is the
host framework's problem, SURVEY.md §5.7); for the TPU framework this is
the capability that lets the serving/training slices scale past one
device's KV memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ["ring_attention"]


def _block_attn(q, k, v, mask, m, l, acc, scale):
    """One online-softmax accumulation step.

    q [B, Tq, H, d]; k/v [B, Tk, H, d]; mask [Tq, Tk] bool.
    Carries: m [B, H, Tq] running max, l [B, H, Tq] running denom,
    acc [B, Tq, H, d] running numerator.
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    s = jnp.where(mask[None, None], s, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    # all-masked rows keep m=-inf; exp(-inf - -inf) guarded to 0
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(s - safe_m[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
    l_new = l * corr + jnp.sum(p, axis=-1)
    pv = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    acc_new = acc * corr.transpose(0, 2, 1)[..., None] + pv
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = True,
) -> jax.Array:
    """Exact (flash-recurrence) attention with q/k/v sharded over ``axis``
    along the sequence dimension.

    Args:
      q, k, v: ``[B, T, H, d]`` (same T; GQA repeat should be done by the
        caller).  T must divide by the axis size.
    Returns ``[B, T, H, d]`` attention output, sharded like ``q``.
    """
    n = mesh.shape[axis]
    B, T, H, d = q.shape
    if T % n:
        raise ValueError(f"sequence {T} does not shard over {n}")
    scale = d**-0.5
    Tl = T // n

    def body(ql, kl, vl):
        idx = jax.lax.axis_index(axis)
        q_pos = idx * Tl + jnp.arange(Tl)  # global positions of local queries

        def step(i, carry):
            kb, vb, m, l, acc = carry
            owner = (idx - i) % n  # whose block we currently hold
            k_pos = owner * Tl + jnp.arange(Tl)
            if causal:
                mask = q_pos[:, None] >= k_pos[None, :]
            else:
                mask = jnp.ones((Tl, Tl), bool)
            m, l, acc = _block_attn(ql, kb, vb, mask, m, l, acc, scale)
            perm = [(j, (j + 1) % n) for j in range(n)]
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return kb, vb, m, l, acc

        m0 = jnp.full((B, H, Tl), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, H, Tl), jnp.float32)
        acc0 = jnp.zeros((B, Tl, H, d), jnp.float32)
        _, _, m, l, acc = jax.lax.fori_loop(0, n, step, (kl, vl, m0, l0, acc0))
        denom = jnp.maximum(l, 1e-38).transpose(0, 2, 1)[..., None]
        return (acc / denom).astype(q.dtype)

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_rep=False
    )(q, k, v)
