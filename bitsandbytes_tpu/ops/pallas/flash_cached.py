"""Flash attention over the (possibly int8-quantized) KV cache.

The serving hot path (SURVEY.md §5.7(a)): decode and cached prefill read the
KV cache `[B, KVH, S, hd]` blockwise in VMEM with the online-softmax
recurrence — no `[B, H, T, S]` score materialization, and for the int8 cache
NO full-cache dequantization (the r2 path dequantized the ENTIRE cache to
bf16 in HBM every step, doubling traffic over a bf16 cache; this kernel
reads the int8 payload once and applies the per-(position, head) scales
post-dot in f32).

Design notes:

* Grid `(B, KVH, S/SB)`; GQA query heads of a KV head are folded with the
  query positions into one `[G*T, hd]` q tile (rows r = g*T + t), so decode
  (T=1, G=4 for Llama-3) and cached prefill (T up to hundreds) share one
  kernel.
* The int8 K block is cast to bf16 (exact: |values| <= 127) and the scale
  applied to the `[GT, SB]` score tile AFTER the MXU dot — hd-times fewer
  multiplies than dequantizing K elementwise, and f32 instead of bf16
  rounding of the scale product (a strictly tighter error class than the
  dense reference path's bf16 `int8*scale` weights).
* V's scale folds into the probability tile before the PV dot for the same
  reason.
* Per-slot validity (`kv_pos <= q_pos`, continuous batching) and the
  sliding window (Mistral) are masks on the score tile; blocks entirely
  outside a slot's window skip their compute (`@pl.when`), though the
  pipeline still streams their bytes (the paged engine avoids even that).
* m/l/acc carries live in VMEM scratch across the S grid dimension
  (declared "arbitrary"); the output block writes once at the last S step.

The reference has no attention ops (bitsandbytes plugs into HF); this is
the TPU-native obligation from SURVEY.md §5.7/BASELINE config #5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "GT_MAX",
    "flash_cached_supported",
    "flash_paged_supported",
    "flash_attention_cached",
    "flash_attention_paged",
    "flash_attention_cached_tp",
    "flash_attention_paged_tp",
]

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def _flash_step(
    step_idx,
    n_steps,
    block_lo,
    length,
    q_ref,
    k_ref,
    v_ref,
    ks_row,  # int8 only: f32 [SB] per-position K scales for this block
    vs_row,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    T: int,
    SB: int,
    window,
    scale: float,
    int8_kv: bool,
):
    """One grid step of the online-softmax recurrence, shared by the dense
    cached kernel and the paged kernel (they differ only in how the K/V
    block and its scales are addressed)."""
    GT, hd = q_ref.shape[2], q_ref.shape[3]

    @pl.when(step_idx == 0)
    def _init():
        m_scr[:] = jnp.full((GT, 128), _NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros((GT, 128), jnp.float32)
        acc_scr[:] = jnp.zeros((GT, hd), jnp.float32)

    # q positions per row: r = g*T + t -> pos = length - (T-1) + t; kv
    # positions 0..length are attendable
    t_of_row = jax.lax.broadcasted_iota(jnp.int32, (GT, SB), 0) % T
    q_pos = length - (T - 1) + t_of_row
    kv_pos = block_lo + jax.lax.broadcasted_iota(jnp.int32, (GT, SB), 1)

    # the whole block is dead for this slot if its first kv position is
    # beyond the newest query (or before the oldest query's window)
    alive = block_lo <= length
    if window is not None:
        alive = jnp.logical_and(alive, block_lo + SB > length - (T - 1) - window)

    @pl.when(alive)
    def _compute():
        q = q_ref[0, 0]  # [GT, hd]
        k = k_ref[0, 0]
        if int8_kv:
            k = k.astype(jnp.bfloat16)  # exact: int8 values
        sc = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [GT, SB]
        if int8_kv:
            # ks_row is [SB] (dense/cached path) or pre-broadcast [GT, SB]
            # (fused paged path — Mosaic can't lane-concat 1-D f32 rows)
            sc = sc * (ks_row if ks_row.ndim == 2 else ks_row[None, :])
        sc = sc * scale
        mask = kv_pos <= q_pos
        if window is not None:
            mask = jnp.logical_and(mask, kv_pos > q_pos - window)
        sc = jnp.where(mask, sc, _NEG_INF)

        m_prev = m_scr[:, :1]  # [GT, 1]
        m_cur = jnp.max(sc, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(sc - m_new)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m_prev - m_new)  # [GT, 1]
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)

        if int8_kv:
            p = p * (vs_row if vs_row.ndim == 2 else vs_row[None, :])
        v = v_ref[0, 0]
        if int8_kv:
            v = v.astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [GT, hd]
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, (GT, 128))
        l_scr[:] = jnp.broadcast_to(l_new, (GT, 128))

    @pl.when(step_idx == n_steps - 1)
    def _finish():
        denom = jnp.maximum(l_scr[:, :1], 1e-38)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _kernel(
    len_ref,  # SMEM [B]: valid length boundary per batch slot
    q_ref,  # [1, 1, GT, hd]
    k_ref,  # [1, 1, SB, hd] (bf16 or int8)
    v_ref,  # [1, 1, SB, hd]
    *rest,  # [ks_ref, vs_ref (int8 only: [1, KVH, S] f32)], o_ref, 3 scratches
    T: int,
    SB: int,
    window,
    scale: float,
    int8_kv: bool,
):
    if int8_kv:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
        ks_ref = vs_ref = None
    # program_id must be bound at kernel top level (the HLO interpreter
    # can't substitute it inside a pl.when closure)
    s = pl.program_id(2)
    h = pl.program_id(1)
    block_lo = s * SB
    # the whole [B] length vector sits in SMEM (rank-1 sub-array blocks are
    # rejected by the Mosaic lowering)
    length = len_ref[pl.program_id(0)]
    _flash_step(
        s,
        pl.num_programs(2),
        block_lo,
        length,
        q_ref,
        k_ref,
        v_ref,
        ks_ref[0, h, pl.ds(block_lo, SB)] if int8_kv else None,
        vs_ref[0, h, pl.ds(block_lo, SB)] if int8_kv else None,
        o_ref,
        m_scr,
        l_scr,
        acc_scr,
        T=T,
        SB=SB,
        window=window,
        scale=scale,
        int8_kv=int8_kv,
    )


# VMEM budget for the folded q rows: the m/l/acc scratches are three
# [GT, >=128] f32 buffers (~1.5 KB/row at hd=128), so GT is capped and
# longer cached prefills must be chunked over T by the caller
# (models/llama.py splits q into chunks of GT_MAX // G rows).
GT_MAX = 2048


def flash_cached_supported(T: int, S: int, hd: int, G: int = 1) -> bool:
    """Static-shape guard: hd must be a lane multiple, S a 128-block
    multiple (the previous ``S % min(sb, S)`` check was vacuous below 512
    and let non-8-multiple sublane blocks through to Mosaic), and the
    folded q rows must fit the VMEM scratch budget."""
    return hd % 128 == 0 and S % 128 == 0 and S >= 128 and G * T <= GT_MAX


def flash_paged_supported(BS: int, hd: int, G: int = 1, T: int = 1) -> bool:
    """Paged-kernel guard: pool block token dim is a sublane (8) multiple,
    hd a lane multiple, folded q rows within the scratch budget."""
    return hd % 128 == 0 and BS % 8 == 0 and G * T <= GT_MAX


def _pick_sb(S: int) -> int:
    for sb in (512, 256, 128):
        if S % sb == 0:
            return sb
    return S


@functools.partial(
    jax.jit, static_argnames=("T", "window", "int8_kv", "out_dtype")
)
def _flash_cached_jit(q, k, v, ks, vs, lengths, *, T, window, int8_kv, out_dtype):
    B, KVH, GT, hd = q.shape
    S = k.shape[2]
    SB = _pick_sb(S)
    GT_pad = max(8, GT)
    if GT < GT_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, GT_pad - GT), (0, 0)))

    grid = (B, KVH, S // SB)
    kernel = functools.partial(
        _kernel,
        T=T,
        SB=SB,
        window=window,
        scale=hd**-0.5,
        int8_kv=int8_kv,
    )
    in_specs = [
        pl.BlockSpec((B,), lambda b, h, s: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, GT_pad, hd), lambda b, h, s: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SB, hd), lambda b, h, s: (b, h, s, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SB, hd), lambda b, h, s: (b, h, s, 0), memory_space=pltpu.VMEM),
    ]
    args = [lengths, q, k, v]
    if int8_kv:
        # whole scale plane per slot: [1, KVH, S] f32 — KVH*S*4 bytes,
        # constant over the h/s dimensions; sliced per (head, block)
        # in-kernel (Mosaic rejects blocked tiles whose minor-two dims are
        # neither 8/128-multiples nor the full array dims)
        in_specs += [
            pl.BlockSpec((1, KVH, S), lambda b, h, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KVH, S), lambda b, h, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, GT_pad, hd), lambda b, h, s: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((GT_pad, 128), jnp.float32),
            pltpu.VMEM((GT_pad, 128), jnp.float32),
            pltpu.VMEM((GT_pad, hd), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, KVH, GT_pad, hd), jnp.dtype(out_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    return out[:, :, :GT]


# ---------------------------------------------------------------------------
# Paged variant: the KV pool is a block table indirection (SURVEY §6
# "paged/blocked KV").  Same online-softmax body; the physical block for
# grid step (b, h, j) comes from the SCALAR-PREFETCHED block table, so the
# BlockSpec index_map itself does the page-table walk — the TPU-native
# PagedAttention.  Dead steps (j beyond the slot's live blocks) clamp to the
# last live block: the pipeline sees an unchanged block index and skips the
# DMA re-fetch, and the body skips compute.
# ---------------------------------------------------------------------------


def _paged_kernel(
    tbl_ref,  # scalar-prefetch [B, MAXB] int32 block table
    len_ref,  # scalar-prefetch [B] int32 newest-query positions
    q_ref,  # [1, 1, GT, hd]
    *rest,  # F k blocks, F v blocks, [F ks, F vs], o_ref, 3 scratches
    T: int,
    BS: int,
    F: int,
    window,
    scale: float,
    int8_kv: bool,
):
    k_refs, v_refs = rest[:F], rest[F : 2 * F]
    idx = 2 * F
    if int8_kv:
        ks_refs, vs_refs = rest[idx : idx + F], rest[idx + F : idx + 2 * F]
        idx += 2 * F
    o_ref, m_scr, l_scr, acc_scr = rest[idx : idx + 4]
    b, h, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    length = len_ref[b]
    # F consecutive LOGICAL blocks per grid step (their physical pool
    # blocks were fetched by F table-walking BlockSpecs), processed as
    # ONE [F*BS]-wide online-softmax step: at BS=128/F=1 the kernel ran
    # 2.25-2.47x the dense cached kernel and the cost tracks the
    # per-block m/l scratch recurrence, not the DMA count — a BS=512
    # pool hits 1.04x (experiments/probe_paged_gap.py).  Concatenating
    # the F fetched tiles in VMEM amortizes the recurrence to one
    # update per F blocks.  Logical blocks are consecutive, so the
    # fused tile's kv positions are contiguous from j*F*BS; dead
    # sub-blocks (beyond a slot's live length, incl. the MAXB rounding)
    # fetched clamped duplicates and are exactly masked by the
    # kv_pos <= q_pos mask inside _flash_step.
    if F == 1:
        kc, vc = k_refs[0], v_refs[0]
        ksc = ks_refs[0][0, h] if int8_kv else None
        vsc = vs_refs[0][0, h] if int8_kv else None
    else:
        # sublane concat of the K/V tiles (cast int8 -> bf16 first: exact,
        # and Mosaic concatenates bf16 vregs where packed int8 is dicier);
        # the f32 scale rows must concat as 2-D [GT, BS] vreg tiles along
        # lanes — Mosaic rejects 1-D f32 lane concatenation
        # (vector<128xf32> x F -> vector<F*128xf32>).
        GT = q_ref.shape[2]
        cast = (lambda a: a.astype(jnp.bfloat16)) if int8_kv else (lambda a: a)
        kc = jnp.concatenate([cast(r[0, 0]) for r in k_refs], axis=0)[None, None]
        vc = jnp.concatenate([cast(r[0, 0]) for r in v_refs], axis=0)[None, None]
        row2d = lambda r: jnp.broadcast_to(r[0, h][None, :], (GT, BS))  # noqa: E731
        ksc = (
            jnp.concatenate([row2d(r) for r in ks_refs], axis=1) if int8_kv else None
        )
        vsc = (
            jnp.concatenate([row2d(r) for r in vs_refs], axis=1) if int8_kv else None
        )
    _flash_step(
        j,
        pl.num_programs(2),
        j * F * BS,
        length,
        q_ref,
        kc,
        vc,
        ksc,
        vsc,
        o_ref,
        m_scr,
        l_scr,
        acc_scr,
        T=T,
        SB=F * BS,
        window=window,
        scale=scale,
        int8_kv=int8_kv,
    )


@functools.partial(jax.jit, static_argnames=("T", "window", "int8_kv", "out_dtype"))
def _flash_paged_jit(q, pool_k, pool_v, ks, vs, tables, lengths, *, T, window, int8_kv, out_dtype):
    B, KVH, GT, hd = q.shape
    NB, _, BS, _ = pool_k.shape
    MAXB = tables.shape[1]
    GT_pad = max(8, GT)
    if GT < GT_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, GT_pad - GT), (0, 0)))

    # fetch factor: F logical blocks per grid step.  Small pool blocks
    # (128 tokens = 16 KB int8) make per-grid-step overhead dominate —
    # measured 2.25x the dense cached kernel at BS=128/F=1 vs 1.04x at
    # BS=512 (experiments/probe_paged_gap.py) — so batch enough blocks
    # per step to put ~512 kv positions in flight.  Dead logical blocks
    # (jj beyond a slot's live length, incl. the MAXB->MAXB_pad rounding)
    # clamp to the last live block: unchanged index -> no DMA re-fetch,
    # and the body's alive-gate skips their compute.
    F = max(1, min(512 // BS, MAXB))
    n_grid = -(-MAXB // F)

    kernel = functools.partial(
        _paged_kernel, T=T, BS=BS, F=F,
        window=window, scale=hd**-0.5, int8_kv=int8_kv,
    )

    def kblk(b, h, j, tbl, lens, f=0):
        # clamp dead steps to the slot's last live block: the block index
        # doesn't change, so the pipeline skips the DMA re-fetch
        jl = jnp.minimum(j * F + f, jnp.maximum(lens[b], 0) // BS)
        return (tbl[b, jl], h, 0, 0)

    def sblk(b, h, j, tbl, lens, f=0):
        jl = jnp.minimum(j * F + f, jnp.maximum(lens[b], 0) // BS)
        return (tbl[b, jl], 0, 0)

    kspecs = [
        pl.BlockSpec((1, 1, BS, hd), functools.partial(kblk, f=f), memory_space=pltpu.VMEM)
        for f in range(F)
    ]
    in_specs = [
        pl.BlockSpec((1, 1, GT_pad, hd), lambda b, h, j, tbl, lens: (b, h, 0, 0), memory_space=pltpu.VMEM),
        *kspecs,
        *kspecs,
    ]
    args = [q] + [pool_k] * F + [pool_v] * F
    if int8_kv:
        sspecs = [
            pl.BlockSpec((1, KVH, BS), functools.partial(sblk, f=f), memory_space=pltpu.VMEM)
            for f in range(F)
        ]
        in_specs += [*sspecs, *sspecs]
        args += [ks] * F + [vs] * F
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, KVH, n_grid),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, GT_pad, hd), lambda b, h, j, tbl, lens: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((GT_pad, 128), jnp.float32),
                pltpu.VMEM((GT_pad, 128), jnp.float32),
                pltpu.VMEM((GT_pad, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KVH, GT_pad, hd), jnp.dtype(out_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(tables.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return out[:, :, :GT]


def flash_attention_paged(
    q: jax.Array,
    pool_k: jax.Array,
    pool_v: jax.Array,
    tables: jax.Array,
    lengths: jax.Array,
    *,
    T: int = 1,
    k_scale=None,
    v_scale=None,
    window=None,
    out_dtype=None,
) -> jax.Array:
    """Paged flash attention: KV lives in a shared block pool
    ``[NB, KVH, BS, hd]`` (int8 with ``k_scale``/``v_scale``
    ``[NB, KVH, BS]``, or bf16); ``tables [B, MAXB]`` maps each slot's
    logical block j to its physical pool block.  ``q`` and ``lengths``
    as in :func:`flash_attention_cached`."""
    int8_kv = pool_k.dtype == jnp.int8
    out_dtype = out_dtype or q.dtype
    return _flash_paged_jit(
        q, pool_k, pool_v, k_scale, v_scale, tables, lengths,
        T=T, window=None if window is None else int(window),
        int8_kv=int8_kv, out_dtype=out_dtype,
    )


def flash_attention_cached(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    *,
    T: int,
    k_scale=None,
    v_scale=None,
    window=None,
    out_dtype=None,
) -> jax.Array:
    """Blockwise (flash) attention of new-token queries against a KV cache.

    Args:
      q: ``[B, KVH, G*T, hd]`` — query heads folded per KV head, rows
        ``r = g*T + t`` (g = head-in-group, t = new-token index).
      k, v: ``[B, KVH, S, hd]`` cache — bf16, or int8 with ``k_scale`` /
        ``v_scale`` ``[B, KVH, S]`` f32 per-(slot, head, position) scales.
      lengths: ``[B]`` int32, position of each slot's NEWEST query token
        (continuous batching: slots at different positions).  kv positions
        ``<= q_pos`` attend; for cached prefill of T tokens the oldest query
        sits at ``lengths - (T-1)``.
      window: optional sliding-window span (Mistral).

    Returns ``[B, KVH, G*T, hd]`` in ``out_dtype`` (defaults to q.dtype).
    """
    int8_kv = k.dtype == jnp.int8
    out_dtype = out_dtype or q.dtype
    return _flash_cached_jit(
        q,
        k,
        v,
        k_scale,
        v_scale,
        lengths.astype(jnp.int32),
        T=T,
        window=None if window is None else int(window),
        int8_kv=int8_kv,
        out_dtype=out_dtype,
    )


# ---------------------------------------------------------------------------
# Tensor-parallel (mesh) wrappers: Megatron-style attention-head sharding.
#
# Pallas kernels do not participate in GSPMD auto-partitioning, so under a
# device mesh the flash calls run inside `jax.shard_map` with the KV-head
# axis split over the ``model`` mesh axis.  Attention is embarrassingly
# parallel over KV heads (each head group's online-softmax recurrence is
# independent), so the mapped body needs NO collectives — the surrounding
# GSPMD program all-gathers/reduce-scatters activations at the projection
# boundaries instead (SURVEY §2.4 "sharded KV / serving"; BASELINE config
# #5's serving layout).  Batch additionally splits over ``data`` when it
# divides evenly (continuous-batching slots are independent too).
# ---------------------------------------------------------------------------


def _tp_axes(mesh, n_kvh: int, n_batch: int, model_axis: str, data_axis: str):
    """(batch_axis | None, model_axis | None) usable for head/batch splits."""
    names = mesh.axis_names
    ma = model_axis if (model_axis in names and mesh.shape[model_axis] > 1) else None
    if ma is not None and n_kvh % mesh.shape[ma]:
        ma = None
    da = data_axis if (data_axis in names and mesh.shape[data_axis] > 1) else None
    if da is not None and n_batch % mesh.shape[da]:
        da = None
    return da, ma


def flash_attention_cached_tp(
    mesh,
    q,
    k,
    v,
    lengths,
    *,
    T: int,
    k_scale=None,
    v_scale=None,
    window=None,
    out_dtype=None,
    model_axis: str = "model",
    data_axis: str = "data",
):
    """:func:`flash_attention_cached` under ``shard_map``: q/k/v/scales split
    their KV-head axis over ``model_axis`` (and batch over ``data_axis``
    when divisible).  Falls back to the unmapped call when the mesh offers
    no usable split."""
    from jax.sharding import PartitionSpec as P

    B, KVH = q.shape[0], q.shape[1]
    da, ma = _tp_axes(mesh, KVH, B, model_axis, data_axis)
    if da is None and ma is None:
        return flash_attention_cached(
            q, k, v, lengths, T=T, k_scale=k_scale, v_scale=v_scale,
            window=window, out_dtype=out_dtype,
        )
    qs = P(da, ma, None, None)
    ss = P(da, ma, None)

    def inner(q, k, v, ks, vs, lens):
        return flash_attention_cached(
            q, k, v, lens, T=T, k_scale=ks, v_scale=vs,
            window=window, out_dtype=out_dtype,
        )

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(qs, qs, qs, ss, ss, P(da)),
        out_specs=qs,
        check_vma=False,
    )(q, k, v, k_scale, v_scale, lengths.astype(jnp.int32))


def flash_attention_paged_tp(
    mesh,
    q,
    pool_k,
    pool_v,
    tables,
    lengths,
    *,
    T: int = 1,
    k_scale=None,
    v_scale=None,
    window=None,
    out_dtype=None,
    model_axis: str = "model",
    data_axis: str = "data",
):
    """:func:`flash_attention_paged` under ``shard_map``: the physical block
    pool splits its KV-head axis over ``model_axis`` (every device holds all
    pool blocks for ITS heads — the block table indirection stays local);
    q/tables/lengths split batch over ``data_axis`` when divisible, with the
    pool replicated across it."""
    from jax.sharding import PartitionSpec as P

    B, KVH = q.shape[0], q.shape[1]
    da, ma = _tp_axes(mesh, KVH, B, model_axis, data_axis)
    if da is None and ma is None:
        return flash_attention_paged(
            q, pool_k, pool_v, tables, lengths, T=T, k_scale=k_scale,
            v_scale=v_scale, window=window, out_dtype=out_dtype,
        )
    qs = P(da, ma, None, None)
    ps = P(None, ma, None, None)  # pool [NB, KVH, BS, hd]
    ss = P(None, ma, None)

    def inner(q, pk, pv, ks, vs, tbl, lens):
        return flash_attention_paged(
            q, pk, pv, tbl, lens, T=T, k_scale=ks, v_scale=vs,
            window=window, out_dtype=out_dtype,
        )

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(qs, ps, ps, ss, ss, P(da, None), P(da)),
        out_specs=qs,
        check_vma=False,
    )(q, pool_k, pool_v, k_scale, v_scale,
      tables.astype(jnp.int32), lengths.astype(jnp.int32))
