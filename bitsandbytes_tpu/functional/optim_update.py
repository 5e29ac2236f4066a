"""Functional optimizer update rules (32-bit and 8-bit blockwise state).

TPU-native re-implementation of the reference optimizer kernels:
  * 32-bit: csrc/kernels.cu:531-913 (oracle: backends/default/ops.py:368-633)
  * 8-bit blockwise: csrc/kernels.cu:914-1330 (oracle:
    backends/cpu/ops.py:469-580) — states stored as uint8 codes against a
    quantile codebook with per-256-element-block absmax; each step dequants,
    updates in fp32, and requants.

Unlike the reference these are *pure functions* returning new (param, state)
values — the natural JAX formulation; optax-style wrappers in
`bitsandbytes_tpu.optim` build stateful optimizers on top.

Supported optimizer names (reference default/ops.py:356-365):
  adam, lamb (adam rule), momentum, lars (momentum rule), rmsprop, adagrad,
  lion, ademamix.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import logging
import os

import jax
import jax.numpy as jnp

import numpy as np

from .blockwise import _ABSMAX_EPS, dequantize_blockwise_with_code, quantize_blockwise_with_code
from .dynamic_segments import (
    SegmentTable,
    SymSegmentTable,
    build_segments,
    build_state_tables,
    segment_decode,
    segment_decode_sym,
    segment_requant,
    segment_requant_sym,
    sign_fixup,
)

__all__ = [
    "optimizer_update_32bit",
    "optimizer_update_8bit_blockwise",
    "OPTIMIZER_NAMES",
    "BLOCKSIZE_8BIT_STATE",
]

OPTIMIZER_NAMES = ("adam", "lamb", "momentum", "lars", "rmsprop", "adagrad", "lion", "ademamix")
_TWO_STATE = ("adam", "lamb", "ademamix")
BLOCKSIZE_8BIT_STATE = 256  # reference ops.cu:154-157


# -- shared 8-bit state (de)quantization helpers ----------------------------
#
# Both the jnp oracle below and the Pallas kernel (ops/pallas/optim8bit.py)
# call these, so the two tiers stay bit-identical.  When the codebook is
# piecewise-linear (the dynamic maps always are) they use segment arithmetic
# (functional/dynamic_segments.py, ~8x fewer VPU ops than 256-entry
# trees/compare-chains); callers fall back to gather/tree paths otherwise.


def state_dequant_blocks(codes2d, absmax_col, table, code_np):
    """Dequantize uint8 state codes laid out ``[NB, 256]`` (or any
    ``[NB, ...]`` whose trailing axes hold one 256-element block, e.g. the
    ``[NB, 2, 128]`` lane-tile form) with per-block absmax ``[NB, 1...]``.
    ``table`` is a SymSegmentTable (half-depth trees), SegmentTable, or
    None; ``code_np`` is the concrete codebook (used only on the fallback
    path)."""
    if isinstance(table, SymSegmentTable):
        vals = segment_decode_sym(codes2d.astype(jnp.int32), table)
    elif table is not None:
        vals = segment_decode(codes2d.astype(jnp.int32), table)
    else:
        vals = jnp.take(jnp.asarray(code_np), codes2d.astype(jnp.int32))
    return vals * absmax_col


def state_requant_blocks(x2d, table, code_np, fixup: bool, am=None):
    """Requantize fp32 state values ``[NB, 256]`` (or ``[NB, ...block]``,
    see :func:`state_dequant_blocks`).  Returns (uint8 codes, raw absmax
    ``[NB, 1...]``).

    Sign-preservation fixup (reference kernels.cu:1118-1133): bump the code
    +/-1 when the quantized slot's sign differs from the value's — applied
    only for signed codebooks, matching the CUDA kernel (state2's unsigned
    map never needs it).

    ``am``: precomputed block absmax (the two-pass route computes it in a
    separate fusion so this pass can rematerialize its input from the raw
    optimizer inputs instead of re-reading f32 states).
    """
    if am is None:
        # reduce every trailing axis: one block per leading index,
        # shape-agnostic so both the [NB, 256] and [NB, 2, 128] forms work.
        # A flat (N,) input means ONE block (the pre-round-5 axis=-1
        # semantics) — without the guard the empty axis tuple would reduce
        # nothing and quantize each element against its own absmax (every
        # code collapses to +/-1.0).
        axes = tuple(range(1, x2d.ndim)) if x2d.ndim > 1 else (0,)
        am = jnp.max(jnp.abs(x2d), axis=axes, keepdims=True)
    scale = 1.0 / jnp.clip(am, _ABSMAX_EPS, None)
    scaled = jnp.clip(x2d * scale, -1.0, 1.0)
    if isinstance(table, SymSegmentTable):
        q = segment_requant_sym(scaled, table)
        if fixup:
            q = sign_fixup(q, scaled, table)
    elif table is not None:
        q = segment_requant(scaled, table)
        if fixup:
            q = sign_fixup(q, scaled, table)
    else:
        code = np.asarray(code_np, np.float32).reshape(-1)
        mids = (code[:-1] + code[1:]) * 0.5
        q = jnp.zeros(scaled.shape, jnp.int32)
        for m in mids:
            q = q + (scaled > np.float32(m)).astype(jnp.int32)
        if fixup and code[0] < 0:
            zero_idx = int(np.abs(code).argmin())
            code_neg = q < zero_idx
            mismatch = code_neg != jnp.signbit(scaled)
            q = jnp.where(
                mismatch, jnp.where(jnp.signbit(scaled), q - 1, q + 1), q
            )
    return q.astype(jnp.uint8), am


def _core_update(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    s1: jax.Array,
    s2: Optional[jax.Array],
    *,
    beta1,
    beta2,
    beta3,
    alpha,
    eps,
    weight_decay,
    step,
    lr,
    update_scale,
):
    """Shared fp32 update math.  Returns (new_p, new_s1, new_s2)."""
    step_f = jnp.asarray(step, jnp.float32)
    new_s2 = None

    if optimizer_name in ("adam", "lamb"):
        new_s1 = s1 * beta1 + (1.0 - beta1) * g
        new_s2 = s2 * beta2 + (1.0 - beta2) * g * g
        correction1 = 1.0 - beta1**step_f
        correction2 = jnp.sqrt(1.0 - beta2**step_f)
        step_size = -lr * correction2 / correction1
        if weight_decay > 0.0:
            p = p * (1.0 - lr * weight_decay)
        # Same grouping as kernels.cu:932-934: eps is scaled by correction2.
        new_p = p + update_scale * step_size * (new_s1 / (jnp.sqrt(new_s2) + eps * correction2))

    elif optimizer_name == "ademamix":
        m1, m2 = s1[0], s1[1]
        new_m1 = m1 * beta1 + (1.0 - beta1) * g
        new_m2 = m2 * beta3 + (1.0 - beta3) * g
        new_s2 = s2 * beta2 + (1.0 - beta2) * g * g
        correction1 = 1.0 - beta1**step_f
        correction2 = jnp.sqrt(1.0 - beta2**step_f)
        if weight_decay > 0.0:
            p = p * (1.0 - lr * weight_decay)
        mixed = new_m1 / correction1 + alpha * new_m2
        adaptive = jnp.sqrt(new_s2) / correction2 + eps
        new_p = p - lr * (mixed / adaptive)
        new_s1 = jnp.stack([new_m1, new_m2])

    elif optimizer_name in ("momentum", "lars"):
        g = g + p * weight_decay
        new_s1 = jnp.where(step_f == 1.0, g, s1 * beta1 + g)
        new_p = p + update_scale * (-lr * new_s1)

    elif optimizer_name == "lion":
        if weight_decay > 0.0:
            p = p * (1.0 - lr * weight_decay)
        update_dir = jnp.sign(s1 * beta1 + (1.0 - beta1) * g)
        new_p = p - update_scale * lr * update_dir
        new_s1 = s1 * beta2 + (1.0 - beta2) * g

    elif optimizer_name == "rmsprop":
        g = g + p * weight_decay
        new_s1 = s1 * beta1 + (1.0 - beta1) * g * g
        new_p = p - update_scale * lr * g / (jnp.sqrt(new_s1) + eps)

    elif optimizer_name == "adagrad":
        g = g + p * weight_decay
        new_s1 = s1 + g * g
        new_p = p - lr * g / (jnp.sqrt(new_s1) + eps)

    else:
        raise ValueError(f"unsupported optimizer {optimizer_name!r}")

    return new_p, new_s1, new_s2


def _update_norm(optimizer_name, g, s1, s2, *, beta1, beta2, eps, step):
    """Precondition pass: squared update norm (reference default/ops.py:
    370-424).  For Lion this is evaluated on the *post-update* state."""
    step_f = jnp.asarray(step, jnp.float32)
    if optimizer_name in ("adam", "lamb"):
        c1 = 1.0 / (1.0 - beta1**step_f)
        c2 = 1.0 / (1.0 - beta2**step_f)
        s1n = (s1 * beta1 + (1.0 - beta1) * g) * c1
        s2n = (s2 * beta2 + (1.0 - beta2) * g * g) * c2
        upd = s1n / (jnp.sqrt(s2n) + eps)
        return jnp.sum(upd * upd)
    if optimizer_name == "ademamix":
        return jnp.sum(s1)
    if optimizer_name in ("momentum", "lars"):
        s1n = jnp.where(step_f == 1.0, g, s1 * beta1 + g)
        return jnp.sum(s1n * s1n)
    if optimizer_name == "lion":
        s1n = s1 * beta2 + (1.0 - beta2) * g
        return jnp.sum(s1n)
    if optimizer_name == "rmsprop":
        s1n = s1 * beta1 + (1.0 - beta1) * g * g
        upd = g / (jnp.sqrt(s1n) + eps)
        return jnp.sum(upd * upd)
    if optimizer_name == "adagrad":
        s1n = s1 + g * g
        upd = g / (jnp.sqrt(s1n) + eps)
        return jnp.sum(upd * upd)
    raise ValueError(optimizer_name)


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("weight_decay", "max_unorm"),
)
def optimizer_update_32bit(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array] = None,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    beta3: float = 0.0,
    alpha: float = 0.0,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    step,
    lr,
    gnorm_scale: float = 1.0,
    max_unorm: float = 0.0,
    param_norm=0.0,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """32-bit optimizer step with fp32 master math on any param dtype.

    Returns ``(new_p, new_state1, new_state2)``.  `max_unorm > 0` clips the
    update norm relative to the param norm (reference ops.cu:107-113; the
    Lion variant evaluates the norm on the updated state, ops.cu:136-149,
    which for a pure function means the clip uses the *previous* step's
    semantics — we follow the non-Lion ordering for all, and Lion's norm on
    its updated state).
    """
    p_dtype = p.dtype
    g_f = g.astype(jnp.float32) * gnorm_scale
    p_f = p.astype(jnp.float32)
    s1 = state1.astype(jnp.float32)
    s2 = state2.astype(jnp.float32) if state2 is not None else None

    update_scale = jnp.float32(1.0)
    if max_unorm > 0.0:
        unorm2 = _update_norm(optimizer_name, g_f, s1, s2, beta1=beta1, beta2=beta2, eps=eps, step=step)
        current = jnp.sqrt(unorm2)
        if optimizer_name in ("momentum", "lars", "rmsprop", "adagrad", "lion"):
            limit = max_unorm * param_norm + eps
        else:
            limit = max_unorm * param_norm
        update_scale = jnp.where(current > limit, limit / current, 1.0).astype(jnp.float32)

    new_p, new_s1, new_s2 = _core_update(
        optimizer_name,
        g_f,
        p_f,
        s1,
        s2,
        beta1=beta1,
        beta2=beta2,
        beta3=beta3,
        alpha=alpha,
        eps=eps,
        weight_decay=weight_decay,
        step=step,
        lr=lr,
        update_scale=update_scale,
    )
    new_p = new_p.astype(p_dtype)
    new_s1 = new_s1.astype(state1.dtype)
    if new_s2 is not None and state2 is not None:
        new_s2 = new_s2.astype(state2.dtype)
    return new_p, new_s1, new_s2


# id-keyed cache of codebook tuples: the qmaps are long-lived module-level
# arrays (optim/base.py); without this every optimizer call per param leaf
# would pull 256 floats to the host and rebuild the static-key tuple.
# Bounded: callers that rebuild qmap arrays per step would otherwise leak
# one device array + tuple per optimizer call over a long training run.
_warned_traced_qmap = False
_code_tuple_cache: dict = {}
_CODE_CACHE_MAX = 64


def _concrete_code_tuple(q):
    if q is None:
        return None
    qa = jnp.asarray(q)
    if isinstance(qa, jax.core.Tracer):
        return None
    ent = _code_tuple_cache.get(id(qa))
    if ent is not None and ent[0] is qa:
        return ent[1]
    t = tuple(float(x) for x in np.asarray(qa).reshape(-1)[:256])
    if len(_code_tuple_cache) >= _CODE_CACHE_MAX:
        _code_tuple_cache.clear()  # tiny entries; wholesale reset is fine
    _code_tuple_cache[id(qa)] = (qa, t)
    return t


def optimizer_update_8bit_blockwise(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array],
    qmap1: jax.Array,
    qmap2: Optional[jax.Array],
    absmax1: jax.Array,
    absmax2: Optional[jax.Array],
    *,
    beta1: float,
    beta2: float,
    beta3: float = 0.0,
    alpha: float = 0.0,
    eps: float,
    weight_decay: float = 0.0,
    step,
    lr,
    gnorm_scale: float = 1.0,
    apply_sign_fixup: bool = True,
):
    """8-bit blockwise optimizer step.

    States are uint8 codes against ``qmap`` codebooks with per-256-element
    block float32 absmax.  Dequant -> fp32 update -> requant, matching the
    fused CUDA kernel's semantics (kernels.cu:914-1330).  NaN/Inf gradient
    elements keep the param and zero their states (kernels.cu:1017,
    1034-1041).  ``apply_sign_fixup=True`` (default) also applies the CUDA
    kernel's sign-preservation bump on signed states (kernels.cu:1118-1133);
    the reference's pure-torch CPU path lacks it (backends/cpu/ops.py:
    569-580), so parity tests against that path pass False.

    Returns ``(new_p, new_state1, new_state2, new_absmax1, new_absmax2)``.

    Default route (all backends): the fused-XLA segment tier
    (:func:`_optimizer_update_8bit_seg`) in its tile4k layout — on TPU it
    beats both the Pallas kernel (whose pallas_call DMA tops out ~220 GB/s
    vs XLA's streaming) and, since round 5, the 32-bit path itself
    (tile4k avoids the physical relayout the historical (NB, 256) view
    forced on every operand; see the dispatch comment below).
    ``BNB_TPU_BACKEND=pallas`` selects the fused Pallas kernel
    (ops/pallas/optim8bit.py) explicitly.  Both tiers share the
    segment-arithmetic (de)quantization in functional/dynamic_segments.py,
    so they stay bit-identical under jit.  The qmaps must be concrete
    (non-traced) arrays for the fast paths — they are baked in as
    compile-time constants.
    """
    from ..ops import dispatch

    code1_t = _concrete_code_tuple(qmap1)
    code2_t = _concrete_code_tuple(qmap2)
    concrete = code1_t is not None and (qmap2 is None or code2_t is not None)

    kwargs = dict(
        beta1=beta1, beta2=beta2, beta3=beta3, alpha=alpha, eps=eps,
        weight_decay=weight_decay, step=step, lr=lr, gnorm_scale=gnorm_scale,
    )

    # The fused Pallas kernel is EXPLICIT-ONLY (BNB_TPU_BACKEND=pallas):
    # on this stack pallas_call streaming tops out at ~220 GB/s while XLA
    # streams the same IO faster as fused elementwise code — measured
    # interleaved on v5e (64M Adam): seg-tile4k 5.4 ms vs the historical
    # seg-2d 6.9 ms vs Pallas kernel 8.88 ms vs 32-bit 6.13 ms
    # (experiments/ab_opt8_twopass.py, ab_opt8_tier.py,
    # probe_opt8_layout.py).  Both tiers share the segment arithmetic and
    # agree bit-exactly under jit.
    if dispatch.backend() == "pallas" and concrete:
        from ..ops.pallas.optim8bit import (
            optimizer_update_8bit_pallas,
            pallas_optim8bit_supported,
        )

        if pallas_optim8bit_supported(optimizer_name):
            return optimizer_update_8bit_pallas(
                optimizer_name, g, p, state1, state2, qmap1, qmap2,
                absmax1, absmax2, apply_sign_fixup=apply_sign_fixup, **kwargs,
            )
    if concrete:
        # Read the env var in THIS (concrete-path) caller and thread it
        # through as a static argument: reading it at trace time inside
        # the jitted fn makes flag flips after the first trace silent
        # no-ops (the pjit cache is keyed only on avals/statics).  NOTE:
        # when this caller is itself traced inside a user's jitted train
        # step, the read still happens once at THAT outer trace — flipping
        # the flag then requires retracing the outer jit too (new fn or
        # cleared cache); only eager/per-call uses pick up flips
        # automatically.  Default OFF pending a valid on-chip A/B (the
        # round-4 one was invalidated by exactly this cache collapse —
        # both arms timed the one-pass graph).
        twopass = os.environ.get("BNB_OPT8_TWOPASS", "0") == "1"
        # Internal block layout: "tile4k" processes flat arrays through the
        # BITCAST-TRUE blocked view (n/4096, 32, 128) — flat f32 carries
        # XLA layout {0:T(1024)} (linear 8x128 tiles) and flat uint8
        # {0:T(4096)}, so this 3D shape is physically identical to flat
        # for both dtypes and a 256-element block is 2 adjacent sublanes
        # (absmax = lane reduce + tiny sublane-pair fold).  The historical
        # "2d" (NB, 256) view splits blocks across lane-tiles of different
        # sublanes, which makes XLA physically relayout every big operand
        # at the jit boundary (+2.6 ms on 64M Adam — profile_opt8_xla.py /
        # probe_opt8_layout.py; PARITY.md Round-5 closures).
        layout = os.environ.get("BNB_OPT8_LAYOUT", "tile4k")
        if layout not in ("tile4k", "2d"):
            raise ValueError(
                f"BNB_OPT8_LAYOUT={layout!r}: expected 'tile4k' or '2d' "
                "(a typo would silently select a layout you didn't ask for)"
            )
        return _optimizer_update_8bit_seg(
            optimizer_name, g, p, state1, state2, absmax1, absmax2,
            code1_t=code1_t, code2_t=code2_t, fixup=apply_sign_fixup,
            twopass=twopass, layout=layout, **kwargs,
        )
    global _warned_traced_qmap
    if not _warned_traced_qmap:
        _warned_traced_qmap = True
        logging.getLogger(__name__).warning(
            "optimizer_update_8bit_blockwise: qmaps are traced values, "
            "forcing the gather-based oracle path (~200x slower on TPU).  "
            "Pass the module-level qmap constants (optim/base.py closes "
            "over them, which keeps them concrete even under jit) instead "
            "of threading qmaps through jit arguments."
        )
    return _optimizer_update_8bit_jnp(
        optimizer_name, g, p, state1, state2, qmap1, qmap2, absmax1, absmax2,
        fixup=apply_sign_fixup, **kwargs,
    )


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "weight_decay", "code1_t", "code2_t", "fixup", "twopass", "layout",
    ),
)
def _optimizer_update_8bit_seg(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array],
    absmax1: jax.Array,
    absmax2: Optional[jax.Array],
    *,
    code1_t,
    code2_t,
    fixup: bool,
    twopass: bool = False,
    layout: str = "tile4k",
    beta1: float,
    beta2: float,
    beta3: float = 0.0,
    alpha: float = 0.0,
    eps: float,
    weight_decay: float = 0.0,
    step,
    lr,
    gnorm_scale: float = 1.0,
):
    """jnp oracle, blocks layout, static codebooks: shares
    state_dequant_blocks/state_requant_blocks with the Pallas kernel.

    ``layout="tile4k"`` processes blocks through the bitcast-true
    ``[n/4096, 32, 128]`` view of flat arrays (see the caller's dispatch
    comment): no big operand is physically relayouted, and the per-block
    absmax is a lane reduce plus a tiny sublane-pair fold.  ``"2d"`` is
    the historical ``[NB, 256]`` form (kept for A/B and as the shape the
    Pallas kernel uses).  Both are bit-identical — the elementwise values
    are unchanged and the per-block max reduce is order-independent."""
    bs = BLOCKSIZE_8BIT_STATE
    p_dtype = p.dtype
    shape = p.shape
    n = p.size
    NB = -(-n // bs)  # true block count (public absmax size)
    tile4k = layout == "tile4k"
    if tile4k:
        TILE = 4096  # flat uint8 tile; 16 blocks x (2 sublanes, 128 lanes)
        pad = (-n) % TILE
        ntiles = (n + pad) // TILE
        blkshape = (ntiles, 32, 128)
        nb_pad = ntiles * 16
    else:
        pad = (-n) % bs
        blkshape = ((n + pad) // bs, bs)
        nb_pad = blkshape[0]
    table1 = build_state_tables(code1_t)
    table2 = build_state_tables(code2_t) if code2_t is not None else None
    zero1 = int(np.abs(np.asarray(code1_t)).argmin())
    zero2 = int(np.abs(np.asarray(code2_t)).argmin()) if code2_t is not None else 0

    def to2(x, fill=0):
        flat = x.reshape(-1)
        if pad:
            flat = jnp.pad(flat, (0, pad), constant_values=fill)
        return flat.reshape(blkshape)

    def un2(x, dtype=None):
        out = x.reshape(-1)[:n].reshape(shape)
        return out.astype(dtype) if dtype is not None else out

    def am_in(a):
        """Input absmax (NB,) -> per-element broadcast for the layout."""
        flat = a.reshape(-1)
        if nb_pad != NB:
            flat = jnp.pad(flat, (0, nb_pad - NB))
        if tile4k:
            b = jnp.repeat(flat.reshape(ntiles, 16), 2, axis=1)[:, :, None]
            return b  # (ntiles, 32, 1), broadcasts against blkshape
        return flat.reshape(nb_pad, 1)

    def block_absmax(x):
        """Per-block absmax of blocked values; returns (broadcastable,
        compact (nb_pad,))."""
        if tile4k:
            am_s = jnp.max(jnp.abs(x), axis=-1)                  # (nt, 32)
            am_b = jnp.max(am_s.reshape(ntiles, 16, 2), axis=-1)  # (nt, 16)
            amb = jnp.repeat(am_b, 2, axis=1)[:, :, None]
            return amb, am_b.reshape(-1)
        am = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        return am, am.reshape(-1)

    def am_out(compact):
        return compact[:NB]

    g2 = to2(g).astype(jnp.float32) * gnorm_scale
    p2 = to2(p).astype(jnp.float32)

    if optimizer_name == "ademamix":
        c1 = (to2(state1[0], zero1), to2(state1[1], zero1))
        a1 = (am_in(absmax1[0]), am_in(absmax1[1]))
    else:
        c1 = to2(state1, zero1)
        a1 = am_in(absmax1)
    c2 = to2(state2, zero2) if state2 is not None else None
    a2 = am_in(absmax2) if state2 is not None else None

    def chain(g2, p2, c1, a1, c2, a2):
        """dequant -> fp32 update -> nonfinite guard: the elementwise
        chain from the raw 8-bit inputs to the new fp32 values."""
        if optimizer_name == "ademamix":
            s1 = jnp.stack(
                [
                    state_dequant_blocks(c1[0], a1[0], table1, code1_t),
                    state_dequant_blocks(c1[1], a1[1], table1, code1_t),
                ]
            )
        else:
            s1 = state_dequant_blocks(c1, a1, table1, code1_t)
        s2 = None
        if c2 is not None:
            s2 = state_dequant_blocks(c2, a2, table2, code2_t)

        new_p, new_s1, new_s2 = _core_update(
            optimizer_name, g2, p2, s1, s2,
            beta1=beta1, beta2=beta2, beta3=beta3, alpha=alpha, eps=eps,
            weight_decay=weight_decay, step=step, lr=lr,
            update_scale=jnp.float32(1.0),
        )

        finite = jnp.isfinite(g2)
        new_p = jnp.where(finite, new_p, p2)
        if optimizer_name == "ademamix":
            new_s1 = jnp.where(finite[None], new_s1, 0.0)
        else:
            new_s1 = jnp.where(finite, new_s1, 0.0)
        if new_s2 is not None:
            new_s2 = jnp.where(finite, new_s2, 0.0)
        return new_p, new_s1, new_s2

    new_p, new_s1, new_s2 = chain(g2, p2, c1, a1, c2, a2)

    # Two-pass requant (OPT-IN via BNB_OPT8_TWOPASS=1, threaded in as a
    # static arg by the public caller): pass A emits new_p + the block
    # absmaxes only; pass B RECOMPUTES the update chain from the raw 8-bit
    # inputs behind an optimization_barrier and requantizes against pass-A's
    # absmaxes, trading ~16 bytes/param of f32 state re-reads for a repeat
    # of the decode+update ALU.  Bit-identical by construction (both passes
    # evaluate the same pure function of the same inputs).  The op is
    # ALU-bound on v5e (see PARITY.md), so the trade loses and the default
    # is the single materializing pass.  (Reference one-pass analog:
    # csrc/kernels.cu:914-1147 reduces absmax in-block in shared memory.)
    if twopass:
        pre1 = (
            (block_absmax(new_s1[0]), block_absmax(new_s1[1]))
            if optimizer_name == "ademamix"
            else block_absmax(new_s1)
        )
        pre2 = block_absmax(new_s2) if new_s2 is not None else None
        gb, pb, c1b, a1b, c2b, a2b = jax.lax.optimization_barrier(
            (g2, p2, c1, a1, c2, a2)
        )
        _, new_s1, new_s2 = chain(gb, pb, c1b, a1b, c2b, a2b)
    else:
        pre1 = pre2 = None

    def requant(x, table, code_t, fix, pre):
        """Requantize against the layout's per-block absmax; returns
        (codes blocked, absmax (NB,))."""
        amb, compact = pre if pre is not None else block_absmax(x)
        q, _ = state_requant_blocks(x, table, code_t, fix, am=amb)
        return q, am_out(compact)

    if optimizer_name == "ademamix":
        q1_1, am1_1 = requant(
            new_s1[0], table1, code1_t, fixup, None if pre1 is None else pre1[0]
        )
        q1_2, am1_2 = requant(
            new_s1[1], table1, code1_t, fixup, None if pre1 is None else pre1[1]
        )
        new_state1 = jnp.stack([un2(q1_1), un2(q1_2)])
        new_absmax1 = jnp.stack([am1_1, am1_2])
    else:
        q1, am1_ = requant(new_s1, table1, code1_t, fixup, pre1)
        new_state1 = un2(q1)
        new_absmax1 = am1_
    new_state2 = new_absmax2 = None
    if new_s2 is not None:
        # unsigned second-moment map: the CUDA kernel skips the fixup there
        q2_, am2_ = requant(new_s2, table2, code2_t, False, pre2)
        new_state2 = un2(q2_)
        new_absmax2 = am2_

    return un2(new_p, p_dtype), new_state1, new_state2, new_absmax1, new_absmax2


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("weight_decay",),
)
def _optimizer_update_8bit_jnp(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array],
    qmap1: jax.Array,
    qmap2: Optional[jax.Array],
    absmax1: jax.Array,
    absmax2: Optional[jax.Array],
    *,
    fixup: bool = True,
    beta1: float,
    beta2: float,
    beta3: float = 0.0,
    alpha: float = 0.0,
    eps: float,
    weight_decay: float = 0.0,
    step,
    lr,
    gnorm_scale: float = 1.0,
):
    """Pure-jnp tier (the oracle; see the public wrapper's docstring)."""
    bs = BLOCKSIZE_8BIT_STATE
    p_dtype = p.dtype

    if optimizer_name == "ademamix":
        s1_1 = dequantize_blockwise_with_code(state1[0], absmax1[0], qmap1, bs, jnp.float32)
        s1_2 = dequantize_blockwise_with_code(state1[1], absmax1[1], qmap1, bs, jnp.float32)
        s1 = jnp.stack([s1_1, s1_2])
    else:
        s1 = dequantize_blockwise_with_code(state1, absmax1, qmap1, bs, jnp.float32)
    s2 = None
    if state2 is not None:
        s2 = dequantize_blockwise_with_code(state2, absmax2, qmap2, bs, jnp.float32)

    g_f = g.astype(jnp.float32) * gnorm_scale
    p_f = p.astype(jnp.float32)

    new_p, new_s1, new_s2 = _core_update(
        optimizer_name,
        g_f,
        p_f,
        s1,
        s2,
        beta1=beta1,
        beta2=beta2,
        beta3=beta3,
        alpha=alpha,
        eps=eps,
        weight_decay=weight_decay,
        step=step,
        lr=lr,
        update_scale=jnp.float32(1.0),
    )

    # CUDA kernel semantics: elements with non-finite gradients keep the
    # param and zero their state contribution (kernels.cu:1017,1034-1041).
    finite = jnp.isfinite(g_f)
    new_p = jnp.where(finite, new_p, p_f)
    if optimizer_name == "ademamix":
        new_s1 = jnp.where(finite[None], new_s1, 0.0)
    else:
        new_s1 = jnp.where(finite, new_s1, 0.0)
    if new_s2 is not None:
        new_s2 = jnp.where(finite, new_s2, 0.0)

    def _fixup_traced(q, vals):
        """Sign-preservation bump (kernels.cu:1118-1133) with a traced
        codebook: signbit(code[q]) vs signbit(value), +/-1 toward the true
        sign; disabled in-graph for unsigned maps."""
        if not fixup:
            return q
        qi = q.astype(jnp.int32)
        code_neg = jnp.signbit(jnp.take(qmap1, qi))
        mismatch = code_neg != jnp.signbit(vals)
        bumped = jnp.where(mismatch, jnp.where(jnp.signbit(vals), qi - 1, qi + 1), qi)
        signed_map = jnp.any(qmap1 < 0)
        return jnp.where(signed_map, bumped, qi).astype(jnp.uint8)

    if optimizer_name == "ademamix":
        q1_1, am1_1 = quantize_blockwise_with_code(new_s1[0], qmap1, bs)
        q1_2, am1_2 = quantize_blockwise_with_code(new_s1[1], qmap1, bs)
        new_state1 = jnp.stack([_fixup_traced(q1_1, new_s1[0]), _fixup_traced(q1_2, new_s1[1])])
        new_absmax1 = jnp.stack([am1_1, am1_2])
    else:
        new_state1, new_absmax1 = quantize_blockwise_with_code(new_s1, qmap1, bs)
        new_state1 = _fixup_traced(new_state1, new_s1)
    new_state2 = new_absmax2 = None
    if new_s2 is not None:
        new_state2, new_absmax2 = quantize_blockwise_with_code(new_s2, qmap2, bs)

    return new_p.astype(p_dtype), new_state1, new_state2, new_absmax1, new_absmax2
