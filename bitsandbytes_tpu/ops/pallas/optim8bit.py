"""Fused 8-bit blockwise optimizer Pallas kernel.

TPU-native analog of the reference's crown-jewel CUDA kernels
``kOptimizerStatic8bit{1,2}StateBlockwise`` (csrc/kernels.cu:914-1330):
per 256-element block, dequantize the uint8 states via codebook x absmax,
run the fp32 update, compute the new per-block absmax, and requantize —
one pass through VMEM, no extra HBM traffic.

TPU has no fast per-lane gather, so the LUT work is restructured:

* **dequant**: 8-level binary *select tree* over the 256-entry codebook
  (255 vselects, compile-time constants) — the same technique as the 4-bit
  GEMM kernel, two levels deeper.
* **requant**: rank = #{midpoints < x} computed as 255 fused
  compare-accumulates (identical semantics to the jnp oracle's
  searchsorted-left bucketize, reference default/ops.py:194-195).

The jnp tier (functional/optim_update.py) remains the oracle; measured on
TPU v5e the gather-based jnp path runs ~230x slower than this kernel's
approach (XLA lowers 256-entry dynamic gathers to a scalar path).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["optimizer_update_8bit_pallas", "pallas_optim8bit_supported"]

_BS = 256  # quantization blocksize (reference ops.cu:154-157)


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def _decode_tree256(q, code: np.ndarray):
    """uint8/int32 codes -> float32 values via an 8-level select tree."""
    def tree(lo, hi):
        if hi - lo == 1:
            return jnp.full(q.shape, np.float32(code[lo]), dtype=jnp.float32)
        mid = (lo + hi) // 2
        return jnp.where(q < mid, tree(lo, mid), tree(mid, hi))

    return tree(0, 256)


def _rank256(x, midpoints: np.ndarray):
    """#{midpoints < x} as 255 fused compare-adds (== searchsorted left)."""
    rank = jnp.zeros(x.shape, jnp.int32)
    for m in midpoints:
        rank = rank + (x > np.float32(m)).astype(jnp.int32)
    return rank


def _dequant_state(codes_i32, am, code: np.ndarray):
    """State dequant: segment arithmetic when the codebook is piecewise-
    linear (the dynamic maps; ~8x fewer VPU ops), else the select tree.
    Shares functional.optim_update.state_dequant_blocks so the Pallas tier
    is bit-identical to the jnp oracle."""
    from ...functional.dynamic_segments import build_state_tables
    from ...functional.optim_update import state_dequant_blocks

    table = build_state_tables(code)
    if table is not None:
        return state_dequant_blocks(codes_i32, am, table, None)
    return _decode_tree256(codes_i32, code) * am


def _requant_state(x, code: np.ndarray, midpoints: np.ndarray, fixup: bool):
    """State requant on a [TB, 256] tile.  Returns (uint8 codes, raw absmax
    [TB, 1]).  Segment arithmetic + sign fixup when piecewise-linear (shared
    with the oracle); compare-rank chain otherwise."""
    from ...functional.dynamic_segments import build_state_tables
    from ...functional.optim_update import state_requant_blocks

    table = build_state_tables(code)
    if table is not None:
        return state_requant_blocks(x, table, None, fixup)
    am = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scaled = jnp.clip(x * (1.0 / jnp.maximum(am, 1e-38)), -1.0, 1.0)
    q = _rank256(scaled, midpoints)
    if fixup and code[0] < 0:
        zero_idx = int(np.abs(code).argmin())
        mismatch = (q < zero_idx) != jnp.signbit(scaled)
        q = jnp.where(mismatch, jnp.where(jnp.signbit(scaled), q - 1, q + 1), q)
    return q.astype(jnp.uint8), am


def _kernel(
    g_ref,
    p_ref,
    s1_ref,
    s2_ref,
    am1_ref,
    am2_ref,
    sc_ref,  # SMEM scalars: [lr, step]
    new_p_ref,
    new_s1_ref,
    new_s2_ref,
    new_am1_ref,
    new_am2_ref,
    *,
    name: str,
    code1: np.ndarray,
    code2: Optional[np.ndarray],
    mid1: np.ndarray,
    mid2: Optional[np.ndarray],
    beta1: float,
    beta2: float,
    eps: float,
    weight_decay: float,
    gnorm_scale: float,
    fixup: bool,
):
    lr = sc_ref[0, 0]
    step_f = sc_ref[0, 1]

    g = g_ref[:].astype(jnp.float32) * gnorm_scale
    p = p_ref[:].astype(jnp.float32)
    s1 = _dequant_state(s1_ref[:].astype(jnp.int32), am1_ref[:], code1)
    s2 = None
    if s2_ref is not None:
        s2 = _dequant_state(s2_ref[:].astype(jnp.int32), am2_ref[:], code2)

    # fp32 update math (same grouping as the jnp oracle / kernels.cu:932-934)
    if name in ("adam", "lamb"):
        new_s1 = s1 * beta1 + (1.0 - beta1) * g
        new_s2 = s2 * beta2 + (1.0 - beta2) * g * g
        c1 = 1.0 - jnp.exp(step_f * np.float32(np.log(beta1)))
        c2 = jnp.sqrt(1.0 - jnp.exp(step_f * np.float32(np.log(beta2))))
        step_size = -lr * c2 / c1
        if weight_decay > 0.0:
            p = p * (1.0 - lr * weight_decay)
        new_p = p + step_size * (new_s1 / (jnp.sqrt(new_s2) + eps * c2))
    elif name in ("momentum", "lars"):
        gw = g + p * weight_decay
        new_s1 = jnp.where(step_f == 1.0, gw, s1 * beta1 + gw)
        new_s2 = None
        new_p = p - lr * new_s1
    elif name == "lion":
        if weight_decay > 0.0:
            p = p * (1.0 - lr * weight_decay)
        new_p = p - lr * jnp.sign(s1 * beta1 + (1.0 - beta1) * g)
        new_s1 = s1 * beta2 + (1.0 - beta2) * g
        new_s2 = None
    elif name == "rmsprop":
        gw = g + p * weight_decay
        new_s1 = s1 * beta1 + (1.0 - beta1) * gw * gw
        new_s2 = None
        new_p = p - lr * gw / (jnp.sqrt(new_s1) + eps)
    elif name == "adagrad":
        gw = g + p * weight_decay
        new_s1 = s1 + gw * gw
        new_s2 = None
        new_p = p - lr * gw / (jnp.sqrt(new_s1) + eps)
    else:
        raise NotImplementedError(name)

    # non-finite gradients: keep param, zero state (kernels.cu:1017,1034-41)
    finite = jnp.isfinite(g)
    new_p = jnp.where(finite, new_p, p_ref[:].astype(jnp.float32))
    new_s1 = jnp.where(finite, new_s1, 0.0)
    if new_s2 is not None:
        new_s2 = jnp.where(finite, new_s2, 0.0)

    new_p_ref[:] = new_p.astype(new_p_ref.dtype)

    q1, am1 = _requant_state(new_s1, code1, mid1, fixup)
    new_am1_ref[:] = am1
    new_s1_ref[:] = q1
    if new_s2 is not None:
        # unsigned second-moment map: CUDA kernel skips the fixup there
        q2, am2 = _requant_state(new_s2, code2, mid2, False)
        new_am2_ref[:] = am2
        new_s2_ref[:] = q2


def _kernel_ademamix(
    g_ref, p_ref, m1_ref, m2_ref, nu_ref, am_m1_ref, am_m2_ref, am_nu_ref,
    sc_ref,  # SMEM scalars: [lr, step, alpha_t, beta3_t]
    new_p_ref, new_m1_ref, new_m2_ref, new_nu_ref,
    new_am_m1_ref, new_am_m2_ref, new_am_nu_ref,
    *, code1, code2, mid1, mid2, beta1, beta2, eps, weight_decay, gnorm_scale,
    fixup,
):
    """AdEMAMix (arXiv:2409.03137; reference optim/ademamix.py +
    kernels.cu:1005-1076): two signed momenta (fast beta1, slow beta3 with
    schedulers) + unsigned second moment."""
    lr = sc_ref[0, 0]
    step_f = sc_ref[0, 1]
    alpha_t = sc_ref[0, 2]
    beta3_t = sc_ref[0, 3]

    g = g_ref[:].astype(jnp.float32) * gnorm_scale
    p = p_ref[:].astype(jnp.float32)
    m1 = _dequant_state(m1_ref[:].astype(jnp.int32), am_m1_ref[:], code1)
    m2 = _dequant_state(m2_ref[:].astype(jnp.int32), am_m2_ref[:], code1)
    nu = _dequant_state(nu_ref[:].astype(jnp.int32), am_nu_ref[:], code2)

    new_m1 = m1 * beta1 + (1.0 - beta1) * g
    new_m2 = m2 * beta3_t + (1.0 - beta3_t) * g
    new_nu = nu * beta2 + (1.0 - beta2) * g * g
    c1 = 1.0 - jnp.exp(step_f * np.float32(np.log(beta1)))
    c2 = jnp.sqrt(1.0 - jnp.exp(step_f * np.float32(np.log(beta2))))
    if weight_decay > 0.0:
        p = p * (1.0 - lr * weight_decay)
    mixed = new_m1 / c1 + alpha_t * new_m2
    adaptive = jnp.sqrt(new_nu) / c2 + eps
    new_p = p - lr * (mixed / adaptive)

    finite = jnp.isfinite(g)
    new_p = jnp.where(finite, new_p, p_ref[:].astype(jnp.float32))
    new_m1 = jnp.where(finite, new_m1, 0.0)
    new_m2 = jnp.where(finite, new_m2, 0.0)
    new_nu = jnp.where(finite, new_nu, 0.0)

    new_p_ref[:] = new_p.astype(new_p_ref.dtype)
    # the two momenta use the signed map (fixup applies); nu's unsigned map
    # does not (kernels.cu:1118-1133 "not needed for state2")
    for val, q_ref, am_ref, cd, mids, fx in (
        (new_m1, new_m1_ref, new_am_m1_ref, code1, mid1, fixup),
        (new_m2, new_m2_ref, new_am_m2_ref, code1, mid1, fixup),
        (new_nu, new_nu_ref, new_am_nu_ref, code2, mid2, False),
    ):
        q, am = _requant_state(val, cd, mids, fx)
        am_ref[:] = am
        q_ref[:] = q


def pallas_optim8bit_supported(name: str) -> bool:
    return name in (
        "adam", "lamb", "momentum", "lars", "lion", "rmsprop", "adagrad", "ademamix"
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "name", "code1_t", "code2_t", "beta1", "beta2", "eps",
        "weight_decay", "gnorm_scale", "two_state", "fixup",
    ),
)
def _run(
    g2, p2, s1_2, s2_2, am1, am2, scalars,
    *, name, code1_t, code2_t, beta1, beta2, eps, weight_decay, gnorm_scale,
    two_state, fixup,
):
    NB = g2.shape[0]
    TB = min(int(os.environ.get("BNB_OPT8_TB", "512")), NB)
    while NB % TB:
        TB //= 2
    grid = (NB // TB,)
    code1 = np.asarray(code1_t, np.float32)
    mid1 = ((code1[:-1] + code1[1:]) * 0.5).astype(np.float32)
    code2 = mid2 = None
    if two_state:
        code2 = np.asarray(code2_t, np.float32)
        mid2 = ((code2[:-1] + code2[1:]) * 0.5).astype(np.float32)

    spec_state = pl.BlockSpec((TB, _BS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_am = pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)

    kern = functools.partial(
        _kernel,
        name=name,
        code1=code1,
        code2=code2,
        mid1=mid1,
        mid2=mid2,
        beta1=beta1,
        beta2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        gnorm_scale=gnorm_scale,
        fixup=fixup,
    )

    if two_state:
        def kern2(g, p, s1, s2, a1, a2, sc, np_, ns1, ns2, na1, na2):
            kern(g, p, s1, s2, a1, a2, sc, np_, ns1, ns2, na1, na2)
        in_specs = [spec_state, spec_state, spec_state, spec_state, spec_am, spec_am, spec_sc]
        out_specs = [spec_state, spec_state, spec_state, spec_am, spec_am]
        out_shape = [
            jax.ShapeDtypeStruct(p2.shape, p2.dtype),
            jax.ShapeDtypeStruct(s1_2.shape, jnp.uint8),
            jax.ShapeDtypeStruct(s2_2.shape, jnp.uint8),
            jax.ShapeDtypeStruct(am1.shape, jnp.float32),
            jax.ShapeDtypeStruct(am2.shape, jnp.float32),
        ]
        return pl.pallas_call(
            kern2, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret(),
        )(g2, p2, s1_2, s2_2, am1, am2, scalars)
    else:
        def kern1(g, p, s1, a1, sc, np_, ns1, na1):
            kern(g, p, s1, None, a1, None, sc, np_, ns1, None, na1, None)
        in_specs = [spec_state, spec_state, spec_state, spec_am, spec_sc]
        out_specs = [spec_state, spec_state, spec_am]
        out_shape = [
            jax.ShapeDtypeStruct(p2.shape, p2.dtype),
            jax.ShapeDtypeStruct(s1_2.shape, jnp.uint8),
            jax.ShapeDtypeStruct(am1.shape, jnp.float32),
        ]
        return pl.pallas_call(
            kern1, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret(),
        )(g2, p2, s1_2, am1, scalars)


@functools.partial(
    jax.jit,
    static_argnames=("code1_t", "code2_t", "beta1", "beta2", "eps", "weight_decay", "gnorm_scale", "fixup"),
)
def _run_ademamix(
    g2, p2, m1_2, m2_2, nu_2, am_m1, am_m2, am_nu, scalars,
    *, code1_t, code2_t, beta1, beta2, eps, weight_decay, gnorm_scale, fixup,
):
    NB = g2.shape[0]
    TB = min(256, NB)
    while NB % TB:
        TB //= 2
    grid = (NB // TB,)
    code1 = np.asarray(code1_t, np.float32)
    code2 = np.asarray(code2_t, np.float32)
    mid1 = ((code1[:-1] + code1[1:]) * 0.5).astype(np.float32)
    mid2 = ((code2[:-1] + code2[1:]) * 0.5).astype(np.float32)

    spec_state = pl.BlockSpec((TB, _BS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_am = pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)

    kern = functools.partial(
        _kernel_ademamix,
        code1=code1, code2=code2, mid1=mid1, mid2=mid2,
        beta1=beta1, beta2=beta2, eps=eps,
        weight_decay=weight_decay, gnorm_scale=gnorm_scale, fixup=fixup,
    )
    out_shape = [
        jax.ShapeDtypeStruct(p2.shape, p2.dtype),
        jax.ShapeDtypeStruct(m1_2.shape, jnp.uint8),
        jax.ShapeDtypeStruct(m2_2.shape, jnp.uint8),
        jax.ShapeDtypeStruct(nu_2.shape, jnp.uint8),
        jax.ShapeDtypeStruct(am_m1.shape, jnp.float32),
        jax.ShapeDtypeStruct(am_m2.shape, jnp.float32),
        jax.ShapeDtypeStruct(am_nu.shape, jnp.float32),
    ]
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[spec_state] * 5 + [spec_am] * 3 + [spec_sc],
        out_specs=[spec_state, spec_state, spec_state, spec_state, spec_am, spec_am, spec_am],
        out_shape=out_shape,
        interpret=_interpret(),
    )(g2, p2, m1_2, m2_2, nu_2, am_m1, am_m2, am_nu, scalars)


def optimizer_update_8bit_pallas(
    name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array],
    qmap1,
    qmap2,
    absmax1: jax.Array,
    absmax2: Optional[jax.Array],
    *,
    beta1: float,
    beta2: float,
    beta3=0.0,
    alpha=0.0,
    eps: float,
    weight_decay: float = 0.0,
    step,
    lr,
    gnorm_scale: float = 1.0,
    apply_sign_fixup: bool = True,
):
    """Fused 8-bit blockwise update.  Same contract as the jnp tier
    (functional.optim_update.optimizer_update_8bit_blockwise); ademamix
    dispatches to the 3-state kernel with alpha_t/beta3_t SMEM scalars."""
    n = p.size
    shape = p.shape
    pad = (-n) % _BS
    NB = (n + pad) // _BS

    def to2(x, fill=0):
        flat = x.reshape(-1)
        if pad:
            flat = jnp.pad(flat, (0, pad), constant_values=fill)
        return flat.reshape(NB, _BS)

    g2 = to2(g)
    p2 = to2(p)

    # Pad state CODES with the index of 0.0 in their codebook: code 0 decodes
    # to -absmax, and a ghost -absmax in the final partial block inflates the
    # requant absmax away from the oracle (which pads float zeros).
    zero1 = int(np.abs(np.asarray(qmap1).reshape(-1)[:256]).argmin())
    zero2 = (
        int(np.abs(np.asarray(qmap2).reshape(-1)[:256]).argmin())
        if qmap2 is not None
        else 0
    )

    if name == "ademamix":
        m1_2, m2_2 = to2(state1[0], zero1), to2(state1[1], zero1)
        nu_2 = to2(state2, zero2)
        am_m1 = absmax1[0].reshape(NB, 1)
        am_m2 = absmax1[1].reshape(NB, 1)
        am_nu = absmax2.reshape(NB, 1)
        scalars = jnp.asarray(
            [[
                jnp.asarray(lr, jnp.float32),
                jnp.asarray(step, jnp.float32),
                jnp.asarray(alpha, jnp.float32),
                jnp.asarray(beta3, jnp.float32),
            ]],
            jnp.float32,
        )
        code1_t = tuple(float(x) for x in np.asarray(qmap1).reshape(-1)[:256])
        code2_t = tuple(float(x) for x in np.asarray(qmap2).reshape(-1)[:256])
        new_p, nm1, nm2, nnu, nam1, nam2, namnu = _run_ademamix(
            g2, p2, m1_2, m2_2, nu_2, am_m1, am_m2, am_nu, scalars,
            code1_t=code1_t, code2_t=code2_t, beta1=beta1, beta2=beta2,
            eps=eps, weight_decay=weight_decay, gnorm_scale=gnorm_scale,
            fixup=apply_sign_fixup,
        )

        def un2(x):
            return x.reshape(-1)[:n].reshape(shape)

        new_s1 = jnp.stack([un2(nm1), un2(nm2)])
        return (
            un2(new_p),
            new_s1,
            un2(nnu),
            jnp.stack([nam1.reshape(-1), nam2.reshape(-1)]),
            namnu.reshape(-1),
        )

    s1_2 = to2(state1, zero1)
    am1 = absmax1.reshape(NB, 1)
    two_state = state2 is not None
    s2_2 = to2(state2, zero2) if two_state else None
    am2 = absmax2.reshape(NB, 1) if two_state else None
    scalars = jnp.asarray(
        [[jnp.asarray(lr, jnp.float32), jnp.asarray(step, jnp.float32)]], jnp.float32
    )

    code1_t = tuple(float(x) for x in np.asarray(qmap1).reshape(-1)[:256])
    code2_t = tuple(float(x) for x in np.asarray(qmap2).reshape(-1)[:256]) if two_state else None

    out = _run(
        g2, p2, s1_2, s2_2, am1, am2, scalars,
        name=name, code1_t=code1_t, code2_t=code2_t,
        beta1=beta1, beta2=beta2, eps=eps,
        weight_decay=weight_decay, gnorm_scale=gnorm_scale, two_state=two_state,
        fixup=apply_sign_fixup,
    )
    if two_state:
        new_p, new_s1, new_s2, new_am1, new_am2 = out
    else:
        new_p, new_s1, new_am1 = out
        new_s2 = new_am2 = None

    def un2(x):
        return x.reshape(-1)[:n].reshape(shape)

    new_p = un2(new_p)
    new_s1 = un2(new_s1)
    if new_s2 is not None:
        new_s2 = un2(new_s2)
    return new_p, new_s1, new_s2, new_am1.reshape(-1), (
        new_am2.reshape(-1) if new_am2 is not None else None
    )
