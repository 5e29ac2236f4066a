"""Optax-style optimizers with 8-bit blockwise state.

TPU-native analog of the reference optimizer stack (bitsandbytes/optim/
optimizer.py + per-optimizer files): instead of torch.optim.Optimizer
subclasses mutating CUDA buffers, each optimizer is an
`optax.GradientTransformation` whose state holds uint8 quantized moments
(+ per-256-block absmax) for large parameters and fp32 moments for small
ones (`min_8bit_size` policy, reference optim/optimizer.py:401-432).

The per-step math lives in `functional.optim_update` (the analog of the
fused CUDA kernels); this module only manages state pytrees.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..functional.blockwise import quantize_blockwise_with_code
from ..functional.codebooks import create_dynamic_map
from ..functional.optim_update import (
    BLOCKSIZE_8BIT_STATE,
    optimizer_update_32bit,
    optimizer_update_8bit_blockwise,
)

__all__ = ["make_optimizer", "BnbOptimizerState"]

_TWO_STATE = ("adam", "lamb", "ademamix")

ScalarOrSchedule = Union[float, Callable]


class BnbOptimizerState(NamedTuple):
    step: jax.Array
    leaves: Any  # pytree (matching params) of per-leaf state dicts


def _leaf_uses_8bit(p, optim_bits: int, min_8bit_size: int) -> bool:
    return optim_bits == 8 and p.size >= min_8bit_size


def _init_leaf(p, name: str, optim_bits: int, min_8bit_size: int, qmap1, qmap2):
    two_state = name in _TWO_STATE
    n = p.size
    if _leaf_uses_8bit(p, optim_bits, min_8bit_size):
        nblocks = -(-n // BLOCKSIZE_8BIT_STATE)
        if name == "ademamix":
            state1 = jnp.zeros((2, *p.shape), jnp.uint8)
            absmax1 = jnp.zeros((2, nblocks), jnp.float32)
        else:
            state1 = jnp.zeros(p.shape, jnp.uint8)
            absmax1 = jnp.zeros((nblocks,), jnp.float32)
        leaf = {"state1": state1, "absmax1": absmax1}
        if two_state:
            leaf["state2"] = jnp.zeros(p.shape, jnp.uint8)
            leaf["absmax2"] = jnp.zeros((nblocks,), jnp.float32)
        return leaf
    if name == "ademamix":
        state1 = jnp.zeros((2, *p.shape), jnp.float32)
    else:
        state1 = jnp.zeros(p.shape, jnp.float32)
    leaf = {"state1": state1}
    if two_state:
        leaf["state2"] = jnp.zeros(p.shape, jnp.float32)
    return leaf


def _ademamix_schedules(step, alpha, beta3, t_alpha, t_beta3):
    """AdEMAMix alpha/beta3 warmup schedulers (reference
    optim/ademamix.py:200-215)."""
    step_f = step.astype(jnp.float32)
    if t_alpha:
        alpha_t = jnp.minimum(step_f * alpha / t_alpha, alpha)
    else:
        alpha_t = jnp.asarray(alpha, jnp.float32)
    if t_beta3:
        # log-space interpolation from beta1-space to beta3
        ln_b1 = np.log(0.9)
        ln_b3 = np.log(beta3)
        frac = jnp.clip(step_f / t_beta3, 0.0, 1.0)
        denom = (1 - frac) / ln_b1 + frac / ln_b3
        beta3_t = jnp.where(step_f >= t_beta3, beta3, jnp.exp(1.0 / denom))
    else:
        beta3_t = jnp.asarray(beta3, jnp.float32)
    return alpha_t, beta3_t


def make_optimizer(
    name: str,
    learning_rate: ScalarOrSchedule = 1e-3,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    beta3: float = 0.0,
    alpha: float = 0.0,
    t_alpha: Optional[int] = None,
    t_beta3: Optional[int] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    optim_bits: int = 32,
    min_8bit_size: int = 4096,
    max_unorm: float = 0.0,
    gnorm_scale: float = 1.0,
    is_paged: bool = False,
) -> optax.GradientTransformation:
    """Build a bitsandbytes-style optimizer as an optax transformation.

    ``optim_bits=8`` stores moments as uint8 blockwise-quantized states for
    every param with >= ``min_8bit_size`` elements (reference
    optim/optimizer.py:401-432).  ``is_paged`` requests host-memory state
    placement (see `bitsandbytes_tpu.optim.paged`).
    """
    if name not in ("adam", "lamb", "momentum", "lars", "rmsprop", "adagrad", "lion", "ademamix"):
        raise ValueError(f"unknown optimizer {name!r}")
    if optim_bits not in (8, 32):
        raise ValueError("optim_bits must be 8 or 32")

    qmap1 = jnp.asarray(create_dynamic_map(signed=True))
    qmap2 = jnp.asarray(create_dynamic_map(signed=False))

    def init_fn(params):
        leaves = jax.tree_util.tree_map(
            lambda p: _init_leaf(p, name, optim_bits, min_8bit_size, qmap1, qmap2), params
        )
        state = BnbOptimizerState(step=jnp.zeros((), jnp.int32), leaves=leaves)
        if is_paged:
            from .paged import to_host

            state = state._replace(leaves=to_host(state.leaves))
        return state

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("bitsandbytes optimizers require params")
        if is_paged:
            # page in: eager compute on pinned_host operands is rejected by
            # the CPU backend and would thrash elsewhere; no-op under jit
            from .paged import unpin_if_eager

            state = state._replace(leaves=unpin_if_eager(state.leaves))
        step = state.step + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate

        if name == "ademamix":
            alpha_t, beta3_t = _ademamix_schedules(step, alpha, beta3, t_alpha, t_beta3)
        else:
            alpha_t, beta3_t = alpha, beta3

        def leaf_update(g, p, leaf):
            if g is None:
                return None, leaf
            if leaf["state1"].dtype == jnp.uint8 and max_unorm > 0.0:
                # LAMB/LARS trust-region clipping needs the global update
                # norm, which the fused blockwise kernel doesn't compute
                # (same in the reference: its 8-bit LAMB/LARS use the
                # non-blockwise kernels, optim/lamb.py block_wise=False).
                # Dequantize states, run the clipped 32-bit update,
                # requantize — identical semantics.
                from ..functional.blockwise import (
                    _dequantize_dispatch,
                    _quantize_dispatch,
                )

                bs = BLOCKSIZE_8BIT_STATE
                if name == "ademamix":
                    raise NotImplementedError("ademamix does not use max_unorm")
                s1f = _dequantize_dispatch(
                    leaf["state1"], leaf["absmax1"], qmap1, bs, jnp.float32
                )
                s2f = None
                if "state2" in leaf:
                    s2f = _dequantize_dispatch(
                        leaf["state2"], leaf["absmax2"], qmap2, bs, jnp.float32
                    )
                param_norm = jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2))
                new_p, s1f, s2f = optimizer_update_32bit(
                    name,
                    g,
                    p,
                    s1f,
                    s2f,
                    beta1=beta1,
                    beta2=beta2,
                    beta3=beta3_t,
                    alpha=alpha_t,
                    eps=eps,
                    weight_decay=weight_decay,
                    step=step,
                    lr=lr,
                    gnorm_scale=gnorm_scale,
                    max_unorm=max_unorm,
                    param_norm=param_norm,
                )
                (s1, am1), _ = _quantize_dispatch(s1f, qmap1, bs)
                new_leaf = dict(leaf, state1=s1, absmax1=am1)
                if s2f is not None:
                    (s2, am2), _ = _quantize_dispatch(s2f, qmap2, bs)
                    new_leaf.update(state2=s2, absmax2=am2)
                update = (new_p.astype(jnp.float32) - p.astype(jnp.float32)).astype(p.dtype)
                return update, new_leaf
            if leaf["state1"].dtype == jnp.uint8:  # 8-bit leaf (static property)
                new_p, s1, s2, am1, am2 = optimizer_update_8bit_blockwise(
                    name,
                    g,
                    p,
                    leaf["state1"],
                    leaf.get("state2"),
                    qmap1,
                    qmap2 if "state2" in leaf else None,
                    leaf["absmax1"],
                    leaf.get("absmax2"),
                    beta1=beta1,
                    beta2=beta2,
                    beta3=beta3_t,
                    alpha=alpha_t,
                    eps=eps,
                    weight_decay=weight_decay,
                    step=step,
                    lr=lr,
                    gnorm_scale=gnorm_scale,
                )
                new_leaf = dict(leaf, state1=s1, absmax1=am1)
                if s2 is not None:
                    new_leaf.update(state2=s2, absmax2=am2)
            else:
                param_norm = 0.0
                if max_unorm > 0.0:
                    param_norm = jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2))
                new_p, s1, s2 = optimizer_update_32bit(
                    name,
                    g,
                    p,
                    leaf["state1"],
                    leaf.get("state2"),
                    beta1=beta1,
                    beta2=beta2,
                    beta3=beta3_t,
                    alpha=alpha_t,
                    eps=eps,
                    weight_decay=weight_decay,
                    step=step,
                    lr=lr,
                    gnorm_scale=gnorm_scale,
                    max_unorm=max_unorm,
                    param_norm=param_norm,
                )
                new_leaf = dict(leaf, state1=s1)
                if s2 is not None:
                    new_leaf["state2"] = s2
            update = (new_p.astype(jnp.float32) - p.astype(jnp.float32)).astype(p.dtype)
            return update, new_leaf

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_leaves = treedef.flatten_up_to(state.leaves)
        results = [leaf_update(g, p, s) for g, p, s in zip(flat_g, flat_p, flat_leaves)]
        updates = jax.tree_util.tree_unflatten(treedef, [r[0] for r in results])
        new_leaves = jax.tree_util.tree_unflatten(treedef, [r[1] for r in results])
        if is_paged:
            # Keep paged states STICKY on host across steps: the update's
            # outputs land device-resident, and without this eager re-pin
            # the second step onward would silently run with device states
            # (defeating the point of paging).  Under jit this is a no-op —
            # traced values carry no placement; jitted callers pin via
            # make_paged_update / paged_state_sharding out_shardings.
            from .paged import repin_if_eager

            new_leaves = repin_if_eager(new_leaves)
        return updates, BnbOptimizerState(step=step, leaves=new_leaves)

    return optax.GradientTransformation(init_fn, update_fn)
