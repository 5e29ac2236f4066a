"""QuantState: the pytree container describing quantized tensors.

TPU-native analog of the reference `QuantState` (bitsandbytes/functional.py:
420-610).  Registered as a JAX pytree so quantized weights flow through
`jit` / `pjit` / `shard_map` / optax transparently: array leaves (absmax,
code, nested stats) are traced/sharded, while blocksize/quant_type/shape/
dtype are static aux data baked into the compiled program.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .codebooks import get_4bit_code

__all__ = ["QuantState"]

_VALID_QUANT_TYPES = ("nf4", "fp4", "int4", "af4", "8bit")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantState:
    """Quantization metadata for a blockwise-quantized tensor.

    Attributes:
      absmax: per-block scale.  float32 ``[nblocks]`` when not nested, or
        uint8 codes of the same shape when ``nested`` (double quantization).
        In the ``"paired"`` layout it is stored *transposed*
        ``[K/blocksize, N]`` (f32 values or uint8 nested codes alike) — the
        fused kernel's native orientation, so no per-call transpose copy is
        paid on the decode path; serialization canonicalizes back to the
        flat interop order.
      code: the codebook used for the payload (16 entries for 4-bit types,
        256 for 8-bit), float32.
      blocksize: quantization block size (static).
      quant_type: one of nf4/fp4/int4/af4/8bit (static).
      dtype: the original (dequantized) dtype (static).
      shape: the original tensor shape (static).
      offset: scalar mean of absmax (float32) when nested, else None.
      state2: a ``QuantState`` describing the quantized absmax when nested
        (code=dynamic 8-bit map, blocksize=256), else None.
      layout: payload byte layout (static): ``"flat"`` = reference-interop
        ``[(n)//2, 1]`` K-adjacent pairs; ``"2d"`` = same bytes as
        ``[N, K/2]``; ``"paired"`` = TPU decode layout ``[N/2, K]`` pairing
        weight rows (2i, 2i+1) per byte (ops/pallas/gemm4bit_paired.py).
        Serialization always canonicalizes to the interop byte order.

    Mirrors reference functional.py:420-610 including the packed dict
    (de)serialization format used for checkpoint interop.
    """

    absmax: jax.Array
    code: jax.Array
    blocksize: int
    quant_type: str
    dtype: Any
    shape: tuple
    offset: Optional[jax.Array] = None
    state2: Optional["QuantState"] = None
    layout: str = "flat"

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        children = (self.absmax, self.code, self.offset, self.state2)
        aux = (self.blocksize, self.quant_type, self.dtype, tuple(self.shape), self.layout)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        absmax, code, offset, state2 = children
        blocksize, quant_type, dtype, shape = aux[:4]
        layout = aux[4] if len(aux) > 4 else "flat"
        return cls(
            absmax=absmax,
            code=code,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=dtype,
            shape=shape,
            offset=offset,
            state2=state2,
            layout=layout,
        )

    @property
    def nested(self) -> bool:
        return self.state2 is not None

    @property
    def n(self) -> int:
        return int(np.prod(self.shape))

    def dequant_absmax(self) -> jax.Array:
        """Recover float32 per-block absmax in canonical flat block order
        (resolving double quantization).

        Reconstruction is ``code2[absmax_8bit] * absmax2 + offset``
        (reference backends/default/ops.py:335-340).  For the canonical
        dynamic map — every state this library or the reference produces
        (quantize_4bit/quantize_blockwise hardcode it, reference
        functional.py:938-951) — ``code2[idx]`` is computed by piecewise-
        linear SEGMENT ARITHMETIC (functional/dynamic_segments.py), the
        same code the fused gemm kernel's in-kernel nested decode runs
        (ops/pallas/gemm4bit_paired._decode_scale_tile), so the two tiers
        stay bit-identical — the 8-bit-optimizer-tier precedent.  The
        segment form is within 2 ulp of the table gather (inside every
        reference-parity budget) and is ~30 fused elementwise XLA ops —
        no gather, no Pallas call, no trace-time concreteness probe.  A
        concrete NON-canonical map falls back to the exact table-gather
        oracle path; under jit the code leaf is a tracer and the canonical
        map is assumed.
        """
        if not self.nested:
            if self.layout == "paired":
                return self.absmax.T.reshape(-1)  # [K/bs, N] -> flat [N*K/bs]
            return self.absmax.reshape(-1)
        from .blockwise import dequantize_blockwise_with_code
        from .codebooks import create_dynamic_map
        from .dynamic_segments import build_segments_sym, segment_decode_sym

        codes = self.absmax
        if self.layout == "paired":
            codes = codes.T  # stored transposed [K/bs, N] -> canonical [N, K/bs]
        codes = codes.reshape(-1)

        code = self.state2.code
        canonical = True
        if not isinstance(code, jax.core.Tracer):
            canonical = np.array_equal(
                np.asarray(code, np.float32),
                np.asarray(create_dynamic_map(), np.float32),
            )
        if canonical:
            table = build_segments_sym(create_dynamic_map())
            v = segment_decode_sym(codes.astype(jnp.int32), table)
            s2 = jnp.repeat(
                self.state2.absmax.reshape(-1).astype(jnp.float32),
                self.state2.blocksize,
                total_repeat_length=codes.shape[0],
            )
            absmax = v * s2
        else:
            absmax = dequantize_blockwise_with_code(
                codes,
                self.state2.absmax,
                code,
                self.state2.blocksize,
                jnp.float32,
            )
        return (absmax.reshape(-1) + self.offset)

    def resolve_nested(self) -> "QuantState":
        """Non-nested copy with the double-quantized absmax materialized to
        float32, in each layout's native storage orientation.

        TPU-native tradeoff for serving/training from DQ checkpoints: the
        reference's fused CUDA kernels dequantize the nested absmax inline
        in registers (~free, gemm_4bit_simt.cu:104-117), but Pallas kernels
        take f32 scale tiles, so a nested state pays a per-matmul absmax
        dequant + transpose (measured: full-model NF4+DQ decode 48 ms/step
        vs 27 for plain NF4).  Resolving once at load makes DQ runtime
        throughput identical to plain NF4 at +absmax-f32 memory (1/32 of
        the weight bytes, ~440 MB on an 8B model); the checkpoint on disk
        keeps the compressed form (re-serializing a resolved state writes
        the plain non-nested format).  Numerics are exactly the nested
        dequant's reconstruction — bit-identical outputs."""
        if not self.nested:
            return self
        absmax = self.dequant_absmax()  # flat canonical f32 [N*K/bs]
        if self.layout == "paired":
            N, K = int(self.shape[-2]), int(self.shape[-1])
            absmax = absmax.reshape(N, K // self.blocksize).T
        return QuantState(
            absmax=absmax,
            code=self.code,
            blocksize=self.blocksize,
            quant_type=self.quant_type,
            dtype=self.dtype,
            shape=self.shape,
            layout=self.layout,
        )

    def dequant_absmax_t(self) -> jax.Array:
        """Per-block absmax in the fused kernel's transposed orientation
        ``[K/blocksize, N]``.  Free (stored that way) for the non-nested
        ``"paired"`` layout; other layouts pay one transpose per call."""
        if not self.nested and self.layout == "paired":
            return self.absmax
        N, K = int(self.shape[-2]), int(self.shape[-1])
        return self.dequant_absmax().reshape(N, K // self.blocksize).T

    # -- serialization (reference functional.py:493-578; utils.py:166-197) ---
    def as_dict(self, packed: bool = False) -> dict:
        """Serialize to a dict of arrays + metadata for checkpointing.

        With ``packed=True``, non-array metadata is JSON-encoded into a uint8
        array under ``quant_state.bitsandbytes__{quant_type}`` — the same
        safetensors-compatible convention the reference uses so checkpoints
        interoperate.
        """
        qs_dict = {
            "quant_type": self.quant_type,
            "blocksize": self.blocksize,
            "dtype": jnp.dtype(self.dtype).name,
            "shape": tuple(int(s) for s in self.shape),
        }
        absmax_canon = self.absmax
        if self.layout == "paired":
            absmax_canon = self.absmax.T.reshape(-1)  # canonical flat order
            # The stats are canonicalized here, but the packed payload the
            # caller holds separately is still in the paired byte order —
            # serializing this dict next to the raw paired payload (e.g.
            # handing both to the reference's from_prequantized) dequantizes
            # to a scrambled weight.  utils.serialization converts the
            # payload via to_layout("flat") first; direct callers must too.
            import warnings

            warnings.warn(
                "QuantState.as_dict on a 'paired'-layout state: stats are "
                "canonicalized to flat interop order, but the packed payload "
                "is NOT part of this dict — convert the tensor with "
                "to_layout('flat') before serializing payload+stats together "
                "(utils.serialization.state_dict_from_tree does this).",
                stacklevel=2,
            )
        tensors = {"absmax": np.asarray(absmax_canon), "quant_map": np.asarray(self.code)}
        if self.nested:
            qs_dict.update(
                {
                    "nested_blocksize": self.state2.blocksize,
                    "nested_dtype": jnp.dtype(self.state2.dtype).name,
                    "nested_offset": float(np.asarray(self.offset)),
                }
            )
            tensors["nested_absmax"] = np.asarray(self.state2.absmax)
            tensors["nested_quant_map"] = np.asarray(self.state2.code)
        if not packed:
            return {**qs_dict, **tensors}
        meta = json.dumps(qs_dict, sort_keys=True).encode("utf8")
        packed_meta = np.frombuffer(meta, dtype=np.uint8).copy()
        return {**tensors, f"quant_state.bitsandbytes__{self.quant_type}": packed_meta}

    @classmethod
    def from_dict(cls, qs_dict: dict) -> "QuantState":
        """Reconstruct a QuantState from :meth:`as_dict` output (packed or
        unpacked)."""
        qs_dict = dict(qs_dict)
        meta_key = next((k for k in qs_dict if k.startswith("quant_state.bitsandbytes__")), None)
        if meta_key is not None:
            meta_bytes = np.asarray(qs_dict.pop(meta_key), dtype=np.uint8).tobytes()
            qs_dict.update(json.loads(meta_bytes.decode("utf8")))
        quant_type = qs_dict["quant_type"]
        if quant_type not in _VALID_QUANT_TYPES:
            raise ValueError(f"invalid quant_type {quant_type!r}")
        absmax = jnp.asarray(qs_dict["absmax"])
        code = jnp.asarray(qs_dict["quant_map"])
        offset = None
        state2 = None
        if "nested_absmax" in qs_dict:
            offset = jnp.asarray(qs_dict["nested_offset"], dtype=jnp.float32)
            state2 = cls(
                absmax=jnp.asarray(qs_dict["nested_absmax"]),
                code=jnp.asarray(qs_dict["nested_quant_map"]),
                blocksize=int(qs_dict["nested_blocksize"]),
                quant_type="8bit",
                dtype=jnp.dtype(qs_dict["nested_dtype"]),
                shape=(int(np.prod(np.asarray(qs_dict["absmax"]).shape)),),
            )
        return cls(
            absmax=absmax,
            code=code,
            blocksize=int(qs_dict["blocksize"]),
            quant_type=quant_type,
            dtype=jnp.dtype(qs_dict["dtype"]),
            shape=tuple(qs_dict["shape"]),
            offset=offset,
            state2=state2,
        )

    @classmethod
    def make(
        cls,
        absmax: jax.Array,
        shape: tuple,
        quant_type: str,
        blocksize: int,
        dtype,
        offset: Optional[jax.Array] = None,
        state2: Optional["QuantState"] = None,
        layout: str = "flat",
    ) -> "QuantState":
        code = jnp.asarray(get_4bit_code(quant_type, blocksize)) if quant_type != "8bit" else None
        return cls(
            absmax=absmax,
            code=code,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=dtype,
            shape=tuple(shape),
            offset=offset,
            state2=state2,
            layout=layout,
        )
