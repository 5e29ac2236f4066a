"""Probe: why is the in-kernel nested-absmax (dynamic-map u8 -> f32)
decode slow in Mosaic?  Times kernel variants that stream a [NB, L] int32
code tile and emit f32, isolating each stage of the segment decode
(functional/dynamic_segments.segment_decode_sym).

Run on the chip: python experiments/probe_dqscale.py
"""
import functools
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
from bitsandbytes_tpu.functional.dynamic_segments import (
    build_segments_sym, segment_decode, segment_decode_sym, _seg_masks_from_idx,
    _const_tree,
)
from bitsandbytes_tpu.utils.benchmark import device_loop_time

SYM = build_segments_sym(create_dynamic_map())


def variant_full(x):
    return segment_decode_sym(x, SYM)


def variant_half_only(x):
    # skip the mirror wrapper: decode |x - z| only
    d = x - np.int32(SYM.zero_idx)
    return segment_decode(jnp.abs(d), SYM.half)


def variant_masks_only(x):
    a = jnp.abs(x - np.int32(SYM.zero_idx))
    masks = _seg_masks_from_idx(a, SYM.half)
    acc = a.astype(jnp.float32)
    for m in masks:
        acc = acc + m.astype(jnp.float32)
    return acc


def variant_one_tree(x):
    a = jnp.abs(x - np.int32(SYM.zero_idx))
    masks = _seg_masks_from_idx(a, SYM.half)
    step = _const_tree(masks, [np.float32(s) for s in SYM.half.steps], jnp.float32)
    return a.astype(jnp.float32) * step


def variant_arith(x):
    return x.astype(jnp.float32) * np.float32(0.001)


VARIANTS = {
    "arith(cast*c)": variant_arith,
    "masks_only": variant_masks_only,
    "one_tree": variant_one_tree,
    "half_only": variant_half_only,
    "full_sym": variant_full,
}


def run(nb=512, L=1024):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(nb, L)), jnp.uint8)
    for name, fn in VARIANTS.items():
        def kern(x_ref, o_ref, fn=fn):
            o_ref[:] = fn(x_ref[:].astype(jnp.int32))

        @jax.jit
        def call(x):
            return pl.pallas_call(
                kern,
                grid=(nb // 64,),
                in_specs=[pl.BlockSpec((64, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((64, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, L), jnp.float32),
            )(x)

        t = device_loop_time(call, (x,), iters=50)
        print(f"{name:16s}: {t*1e6:8.2f} us  ({t/ (nb*L) * 1e12:7.2f} ps/elem)", flush=True)


if __name__ == "__main__":
    run()
