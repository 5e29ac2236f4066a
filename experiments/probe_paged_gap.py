"""Decompose the paged-vs-dense decode gap (serving chunk 38.5 vs 34.7 ms).

Per decode step at the serving geometry (bs=16, 4 layers, max_len 512,
int8 KV) the paged engine pays ~0.47 ms more than dense.  Two suspects,
measured here in isolation on-chip with device_loop_time:

  1. the KV APPEND: dense writes `.at[ar, :, pos].set(...)` into
     [B, KVH, S, hd]; paged writes `.at[blk, :, off].set(...)` into the
     block pool [NB, KVH, BS, hd] — a two-level dynamic scatter.
  2. the ATTENTION op: flash_attention_cached vs flash_attention_paged
     (page-table walk in the BlockSpec index_map, MAXB grid steps).

Run: python experiments/probe_paged_gap.py   (on the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bitsandbytes_tpu.ops.pallas.flash_cached import (
    flash_attention_cached,
    flash_attention_paged,
)
from bitsandbytes_tpu.utils.benchmark import device_loop_time

B, KVH, H, hd = 16, 8, 32, 128
S, BS = 512, 128
NB = B * (S // BS)  # pool exactly covers the slots
MAXB = S // BS
G = H // KVH


def canary_us():
    x = jnp.ones((512, 4096), jnp.bfloat16)
    w = jnp.ones((4096, 4096), jnp.bfloat16)
    return device_loop_time(lambda a, b: (a @ b).astype(jnp.bfloat16), (x, w), iters=20) * 1e6


def main():
    if jax.default_backend() in ("cpu", "gpu"):
        print("probe requires the TPU chip")
        return
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # --- state ---
    dense_k = jnp.asarray(rng.integers(-127, 127, (B, KVH, S, hd)), jnp.int8)
    dense_ks = jnp.asarray(rng.random((B, KVH, S)), jnp.float32)
    pool_k = jnp.asarray(rng.integers(-127, 127, (NB, KVH, BS, hd)), jnp.int8)
    pool_ks = jnp.asarray(rng.random((NB, KVH, BS)), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(NB).reshape(B, MAXB), jnp.int32
    )
    lengths = jnp.full((B,), S // 2, jnp.int32)
    new_kv = jnp.asarray(rng.integers(-127, 127, (B, KVH, hd)), jnp.int8)
    new_s = jnp.asarray(rng.random((B, KVH)), jnp.float32)
    q = jax.random.normal(key, (B, KVH, G, hd), jnp.bfloat16)

    print(f"canary {canary_us():.1f} us")

    # --- 1. append ---
    ar = jnp.arange(B)

    def append_dense(ck, cks, kw, ks, pos):
        ck = ck.at[ar, :, pos].set(kw)
        cks = cks.at[ar, :, pos].set(ks)
        return ck, cks

    def append_paged(pk, pks, kw, ks, pos, tbl):
        blk = tbl[ar, pos // BS]
        off = pos % BS
        pk = pk.at[blk, :, off].set(kw)
        pks = pks.at[blk, :, off].set(ks)
        return pk, pks

    t_d = [
        device_loop_time(append_dense, (dense_k, dense_ks, new_kv, new_s, lengths), iters=50)
        for _ in range(3)
    ]
    t_p = [
        device_loop_time(
            append_paged, (pool_k, pool_ks, new_kv, new_s, lengths, tables), iters=50
        )
        for _ in range(3)
    ]
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        f"append   dense {med(t_d)*1e6:7.1f} us   paged {med(t_p)*1e6:7.1f} us"
        f"   (x{med(t_p)/med(t_d):.2f})"
    )

    # --- 2. attention op --- (all state rides as loop args, nothing closed
    # over: closure constants get baked into the compiled loop)
    def attn_cached(q, k, v, ks, vs, lens):
        return flash_attention_cached(q, k, v, lens, T=1, k_scale=ks, v_scale=vs)

    def attn_paged(q, pk, pv, pks, pvs, tbl, lens):
        return flash_attention_paged(
            q, pk, pv, tbl, lens, T=1, k_scale=pks, v_scale=pvs
        )

    t_c = [
        device_loop_time(
            attn_cached, (q, dense_k, dense_k, dense_ks, dense_ks, lengths), iters=50
        )
        for _ in range(3)
    ]
    t_g = [
        device_loop_time(
            attn_paged, (q, pool_k, pool_k, pool_ks, pool_ks, tables, lengths), iters=50
        )
        for _ in range(3)
    ]
    print(
        f"attn     cached {med(t_c)*1e6:6.1f} us   paged {med(t_g)*1e6:7.1f} us"
        f"   (x{med(t_g)/med(t_c):.2f})"
    )
    print(f"canary {canary_us():.1f} us")
    # per-step budget: 4 layers x (append delta + attn delta) vs the
    # measured chunk delta (38.5 - 34.7) / 8 steps = ~470 us
    d_app = (med(t_p) - med(t_d)) * 4e6
    d_att = (med(t_g) - med(t_c)) * 4e6
    print(f"4-layer deltas: append {d_app:+.1f} us/step, attn {d_att:+.1f} us/step "
          f"(measured serving delta ~+470 us/step)")

    # --- 3. block-size sweep: the paged grid runs MAXB steps of [BS, hd]
    # DMAs; bigger blocks = fewer grid steps + better DMA pipelining at the
    # cost of pool granularity (fragmentation).
    for bs2 in (256, 512):
        maxb2 = S // bs2
        nb2 = B * maxb2
        pk2 = jnp.asarray(rng.integers(-127, 127, (nb2, KVH, bs2, hd)), jnp.int8)
        ps2 = jnp.asarray(rng.random((nb2, KVH, bs2)), jnp.float32)
        tb2 = jnp.asarray(rng.permutation(nb2).reshape(B, maxb2), jnp.int32)
        t2 = [
            device_loop_time(
                attn_paged, (q, pk2, pk2, ps2, ps2, tb2, lengths), iters=50
            )
            for _ in range(3)
        ]
        print(f"attn     paged BS={bs2}: {med(t2)*1e6:6.1f} us  (x{med(t2)/med(t_c):.2f} cached)")
    print(f"canary {canary_us():.1f} us")


if __name__ == "__main__":
    main()
