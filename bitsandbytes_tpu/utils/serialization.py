"""Checkpoint (de)serialization for quantized param trees.

Follows the reference's serialized-quant-state conventions so checkpoints
interoperate with bitsandbytes/HF-Transformers formats:

* a 4-bit weight serializes as ``{key}`` (packed payload) plus component
  tensors ``{key}.absmax``, ``{key}.quant_map``, ``{key}.nested_absmax``,
  ``{key}.nested_quant_map`` and a JSON-in-uint8 metadata tensor
  ``{key}.quant_state.bitsandbytes__{nf4|fp4}`` (reference
  functional.py:493-578 `QuantState.as_dict(packed=True)`,
  utils.py:166-197 `pack_dict_to_tensor`, nn/modules.py:355-379
  `Params4bit.from_prequantized`).
* an LLM.int8() weight serializes as ``{key}`` (int8 CB) + ``{key}.SCB``
  (reference Linear8bitLt state-dict handling, nn/modules.py:1095-1157).
* everything else serializes as a plain array under its tree path.

The flat dict of numpy arrays can be written with orbax, np.savez, or
safetensors — any tensor-dict container.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..functional.quant_state import QuantState
from ..nn.modules import Int8TensorState, QuantizedTensor

__all__ = [
    "state_dict_from_params",
    "params_from_state_dict",
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_safetensors",
    "load_checkpoint_safetensors",
    "import_hf_llama",
]


def _is_q(x):
    return isinstance(x, (QuantizedTensor, Int8TensorState))


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def _np_safe(a) -> np.ndarray:
    """numpy array in a dtype plain numpy containers can round-trip.
    bf16/fp8 (ml_dtypes) widen losslessly to float32."""
    a = np.asarray(a)
    if a.dtype.kind == "V" or a.dtype.name in ("bfloat16", "float8_e4m3fn", "float8_e5m2"):
        return a.astype(np.float32)
    return a


# ml_dtypes names safetensors can serialize natively from numpy (verified
# on the installed safetensors 0.8.0: bf16 round-trip).  Other ml_dtypes
# (float8_e4m3fnuz/_b11fnuz, int4, ...) have no container support and must
# widen — but the "keep storage dtypes" path warns, because the round-trip
# then returns a different dtype than was saved.
_SAFETENSORS_ML_DTYPES = ("bfloat16", "float8_e4m3fn", "float8_e5m2")


def _np_keep_ml_dtypes(a) -> np.ndarray:
    """numpy array preserving bf16/fp8 storage dtypes, but still widening
    true void dtypes (structured / opaque / unsupported ml_dtypes), which
    the tensor container cannot serialize.  Used by
    ``widen_ml_dtypes=False`` — the narrow path must keep the void guard
    or saves crash on exotic leaves."""
    a = np.asarray(a)
    if a.dtype.kind == "V" and a.dtype.name not in _SAFETENSORS_ML_DTYPES:
        import warnings

        warnings.warn(
            f"widen_ml_dtypes=False cannot keep dtype {a.dtype.name!r} "
            "(no safetensors support): widening to float32 — the reload "
            "will NOT restore the original storage dtype",
            stacklevel=3,
        )
        return a.astype(np.float32)
    return a


def state_dict_from_params(params: Any, widen_ml_dtypes: bool = True) -> dict:
    """Flatten a (possibly quantized) param tree to ``{name: np.ndarray}``.

    ``widen_ml_dtypes=False`` keeps bf16/fp8 leaves in their storage dtype
    (safetensors serializes BF16 natively — HF quantized checkpoints ship
    bf16 tensors; the npz container needs the float32 widening).
    """
    out = {}
    safe = _np_safe if widen_ml_dtypes else _np_keep_ml_dtypes

    def visit(path, leaf):
        key = _path_str(path)
        if isinstance(leaf, QuantizedTensor):
            # checkpoint interop uses the reference-canonical flat
            # [(n+1)//2, 1] payload shape and K-adjacent byte order
            # (reference backends/cuda/ops.py:392); the TPU 'paired' decode
            # layout is relaid out on save so checkpoints stay portable
            canon = leaf.to_layout("flat") if leaf.state.layout == "paired" else leaf
            out[key] = safe(canon.data).reshape(-1, 1)
            for comp, arr in canon.state.as_dict(packed=True).items():
                out[f"{key}.{comp}"] = safe(arr)
        elif isinstance(leaf, Int8TensorState):
            out[key] = safe(leaf.CB)
            out[f"{key}.SCB"] = safe(leaf.SCB)
        elif leaf is not None:
            out[key] = safe(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params, is_leaf=_is_q)
    return out


_QS_META = re.compile(r"\.quant_state\.bitsandbytes__(nf4|fp4|int4|af4|8bit)$")


def params_from_state_dict(sd: dict, template: Optional[Any] = None) -> Any:
    """Rebuild a param tree from a flat state dict.

    With ``template`` (a pytree of the same structure, e.g. from
    ``init_params`` + ``quantize_params_*``), leaves are rebuilt to the
    template's leaf types and tree structure.  Without one, returns a flat
    ``{name: array-or-QuantizedTensor-or-Int8TensorState}`` dict with
    component keys folded in.
    """
    folded = _fold_components(sd)
    if template is None:
        return folded

    def rebuild(path, leaf):
        key = _path_str(path)
        if key not in folded:
            raise KeyError(f"checkpoint missing {key!r}")
        val = folded[key]
        if isinstance(leaf, QuantizedTensor):
            if not isinstance(val, QuantizedTensor):
                raise TypeError(f"{key!r}: expected quantized leaf in checkpoint")
            # adopt the template's payload layout (e.g. the 'paired' decode
            # layout) — a one-time load-side relayout
            return val.to_layout(leaf.state.layout)
        if isinstance(leaf, Int8TensorState):
            if not isinstance(val, Int8TensorState):
                raise TypeError(f"{key!r}: expected int8 leaf in checkpoint")
            return val
        return jnp.asarray(val, dtype=leaf.dtype).reshape(leaf.shape)

    return jax.tree_util.tree_map_with_path(rebuild, template, is_leaf=_is_q)


def _fold_components(sd: dict) -> dict:
    """Group ``{key}.absmax``-style component tensors into QuantizedTensor /
    Int8TensorState values keyed by their base name."""
    sd = dict(sd)
    out = {}
    # 4-bit: find meta tensors first
    quant_bases = {}
    for k in list(sd):
        m = _QS_META.search(k)
        if m:
            base = k[: m.start()]
            quant_bases[base] = k
    comp_names = (
        "absmax",
        "quant_map",
        "nested_absmax",
        "nested_quant_map",
    )
    for base, meta_key in quant_bases.items():
        # component name, e.g. "quant_state.bitsandbytes__nf4"
        comp = {meta_key[len(base) + 1 :]: sd.pop(meta_key)}
        for name in comp_names:
            k = f"{base}.{name}"
            if k in sd:
                comp[name] = sd.pop(k)
        state = QuantState.from_dict(comp)
        data = np.asarray(sd.pop(base))
        # restore the TPU-native 2-D payload layout when rows own whole
        # quantization blocks (mirrors QuantizedTensor.quantize)
        shp = state.shape
        if (
            len(shp) == 2
            and shp[1] % state.blocksize == 0
            and shp[1] % 2 == 0
            and data.size % shp[0] == 0
        ):
            data = data.reshape(shp[0], -1)
        out[base] = QuantizedTensor(data=jnp.asarray(data), state=state)
    # int8: CB + SCB
    for k in list(sd):
        if k.endswith(".SCB"):
            base = k[: -len(".SCB")]
            if base in sd:
                out[base] = Int8TensorState(
                    CB=jnp.asarray(sd.pop(base)), SCB=jnp.asarray(sd.pop(k))
                )
                sd.pop(k, None)
    out.update(sd)
    return out


def save_checkpoint(path: str, params: Any) -> None:
    """Write a param tree to an ``.npz`` checkpoint."""
    np.savez(path, **state_dict_from_params(params))


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    with np.load(path, allow_pickle=False) as z:
        sd = {k: z[k] for k in z.files}
    return params_from_state_dict(sd, template)


def save_checkpoint_safetensors(path: str, params: Any, metadata: Optional[dict] = None) -> None:
    """Write a param tree to a ``.safetensors`` file.

    The flat tensor names follow the reference's serialized-quant-state
    conventions (see module docstring), so the file is loadable by the
    reference stack: ``safetensors.torch.load_file`` on it yields exactly
    the dict `Params4bit.from_prequantized` consumes (reference
    nn/modules.py:355-379; HF-Transformers quantized checkpoints ship as
    safetensors in this layout)."""
    from safetensors.numpy import save_file

    sd = {
        k: np.ascontiguousarray(v)
        for k, v in state_dict_from_params(params, widen_ml_dtypes=False).items()
    }
    save_file(sd, path, metadata=metadata)


def load_checkpoint_safetensors(path: str, template: Optional[Any] = None) -> Any:
    """Load a ``.safetensors`` checkpoint written by
    :func:`save_checkpoint_safetensors` (or by the reference/HF stack in the
    same flat layout).  With ``template``, rebuilds the full param tree;
    without, returns the folded flat dict."""
    from safetensors.numpy import load_file

    return params_from_state_dict(load_file(path), template)


# ---------------------------------------------------------------------------
# HF Transformers interop
# ---------------------------------------------------------------------------

_HF_LLAMA_MAP = {
    "self_attn.q_proj": "wq",
    "self_attn.k_proj": "wk",
    "self_attn.v_proj": "wv",
    "self_attn.o_proj": "wo",
    "mlp.gate_proj": "gate",
    "mlp.up_proj": "up",
    "mlp.down_proj": "down",
    "input_layernorm": "attn_norm",
    "post_attention_layernorm": "mlp_norm",
}


def import_hf_llama(
    hf_state_dict: dict,
    cfg,
    quantize=None,
    dtype=jnp.bfloat16,
) -> dict:
    """Map an HF-Transformers Llama state dict (torch or numpy tensors,
    standard `model.layers.N.self_attn.q_proj.weight` naming) onto the
    :mod:`bitsandbytes_tpu.models.llama` param tree.

    ``quantize``: optional per-weight hook (callable), or one of the
    strings ``"nf4"`` / ``"fp4"`` / ``"int8"`` — the analog of loading with
    ``load_in_4bit=True`` / ``load_in_8bit=True`` (reference
    examples/int8_inference_huggingface.py:11-15).  4-bit string modes use
    the native C++/OpenMP host quantizer when available so multi-GB
    checkpoints convert on the CPU without touching the TPU.
    """
    if isinstance(quantize, str):
        mode = quantize

        def quantize(W):  # noqa: F811
            if mode == "int8":
                return Int8TensorState.quantize(W)
            Wnp = np.asarray(W, np.float32)
            from . import native

            if native.available() and Wnp.ndim == 2 and Wnp.shape[1] % 64 == 0:
                packed, absmax = native.quantize_4bit_host(Wnp, 64, mode)
                state = QuantState.make(
                    absmax=jnp.asarray(absmax),
                    shape=Wnp.shape,
                    quant_type=mode,
                    blocksize=64,
                    dtype=jnp.float32,
                    layout="2d",
                )
                qt = QuantizedTensor(
                    data=jnp.asarray(packed.reshape(Wnp.shape[0], -1)), state=state
                )
                if Wnp.shape[0] % 2 == 0:
                    # serve through the fast paired decode kernel
                    qt = qt.to_layout("paired")
                return qt
            return QuantizedTensor.quantize(jnp.asarray(Wnp), quant_type=mode)

    def to_np(t):
        if hasattr(t, "detach"):  # torch tensor
            t = t.detach().to("cpu")
            if t.dtype.__str__() == "torch.bfloat16":
                t = t.float()
            t = t.numpy()
        return np.asarray(t)

    sd = {k: v for k, v in hf_state_dict.items()}

    def get(name):
        for prefix in ("model.", ""):
            k = prefix + name
            if k in sd:
                return to_np(sd[k])
        raise KeyError(name)

    def linear(name):
        W = get(name + ".weight")
        if quantize is not None:
            return quantize(jnp.asarray(W, jnp.float32))
        return jnp.asarray(W, dtype)

    def maybe_bias(name):
        """q/k/v projection biases (Qwen2-family checkpoints)."""
        for prefix in ("model.", ""):
            k = prefix + name + ".bias"
            if k in sd:
                return jnp.asarray(to_np(sd[k]), dtype)
        return None

    layers = []
    for i in range(cfg.num_layers):
        layer = {}
        for hf_name, ours in _HF_LLAMA_MAP.items():
            full = f"layers.{i}.{hf_name}"
            if ours.endswith("norm"):
                layer[ours] = jnp.asarray(get(full + ".weight"), dtype)
            else:
                layer[ours] = linear(full)
                if ours in ("wq", "wk", "wv"):
                    b = maybe_bias(full)
                    if b is not None:
                        layer[ours + "_b"] = b
        layers.append(layer)

    embed = jnp.asarray(get("embed_tokens.weight"), dtype)
    try:
        lm_head = jnp.asarray(to_np(sd["lm_head.weight"]), dtype)
    except KeyError:  # tied embeddings
        lm_head = embed
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.asarray(get("norm.weight"), dtype),
        "lm_head": lm_head,
    }
