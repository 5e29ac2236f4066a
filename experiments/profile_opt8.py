"""Profile the fused 8-bit Adam kernel: where do the milliseconds go?

Stages (each a standalone Pallas kernel over the same [TB, 256] tiles):
  io      : read g/p/s1/s2/am, write p/s1/s2/am back (pure DMA floor)
  dequant : io + state dequant (masks + trees + FMA) x2
  update  : dequant + the f32 Adam math
  full    : the shipped kernel (update + requant x2)

Also sweeps BNB_OPT8_TB over the full kernel and times the 32-bit path
for the <=1.0x target (VERDICT r2 item 2).  Run on the real chip.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
from bitsandbytes_tpu.functional.optim_update import (
    state_dequant_blocks,
    state_requant_blocks,
)
from bitsandbytes_tpu.functional.dynamic_segments import build_state_tables, build_segments
from bitsandbytes_tpu.utils.benchmark import device_loop_time

N = 64 * 1024 * 1024
BS = 256
NB = N // BS

CODE1 = np.asarray(create_dynamic_map(signed=True), np.float32)
CODE2 = np.asarray(create_dynamic_map(signed=False), np.float32)


def stage_kernel(g_ref, p_ref, s1_ref, s2_ref, am1_ref, am2_ref,
                 np_ref, ns1_ref, ns2_ref, nam1_ref, nam2_ref,
                 *, stage, sym):
    tables = (build_state_tables if sym else build_segments)
    t1, t2 = tables(CODE1), tables(CODE2)
    g = g_ref[:].astype(jnp.float32)
    p = p_ref[:].astype(jnp.float32)
    if stage == "io":
        np_ref[:] = p + g
        ns1_ref[:] = s1_ref[:]
        ns2_ref[:] = s2_ref[:]
        nam1_ref[:] = am1_ref[:]
        nam2_ref[:] = am2_ref[:]
        return
    s1 = state_dequant_blocks(s1_ref[:].astype(jnp.int32), am1_ref[:], t1, CODE1)
    s2 = state_dequant_blocks(s2_ref[:].astype(jnp.int32), am2_ref[:], t2, CODE2)
    if stage == "dequant":
        np_ref[:] = p + g + s1 + s2
        ns1_ref[:] = s1_ref[:]
        ns2_ref[:] = s2_ref[:]
        nam1_ref[:] = am1_ref[:]
        nam2_ref[:] = am2_ref[:]
        return
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-3
    new_s1 = s1 * b1 + (1 - b1) * g
    new_s2 = s2 * b2 + (1 - b2) * g * g
    c1 = 1.0 - jnp.exp(jnp.float32(10.0) * np.float32(np.log(b1)))
    c2 = jnp.sqrt(1.0 - jnp.exp(jnp.float32(10.0) * np.float32(np.log(b2))))
    new_p = p + (-lr * c2 / c1) * (new_s1 / (jnp.sqrt(new_s2) + eps * c2))
    finite = jnp.isfinite(g)
    new_p = jnp.where(finite, new_p, p)
    new_s1 = jnp.where(finite, new_s1, 0.0)
    new_s2 = jnp.where(finite, new_s2, 0.0)
    np_ref[:] = new_p
    if stage == "update":
        ns1_ref[:] = s1_ref[:]
        ns2_ref[:] = s2_ref[:]
        nam1_ref[:] = am1_ref[:]
        nam2_ref[:] = am2_ref[:]
        return
    q1, am1 = state_requant_blocks(new_s1, t1, CODE1, True)
    q2, am2 = state_requant_blocks(new_s2, t2, CODE2, False)
    ns1_ref[:] = q1
    ns2_ref[:] = q2
    nam1_ref[:] = am1
    nam2_ref[:] = am2


def run_stage(stage, TB, sym, data):
    g2, p2, s1, s2, am1, am2 = data
    spec_s = pl.BlockSpec((TB, BS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(stage_kernel, stage=stage, sym=sym),
        grid=(NB // TB,),
        in_specs=[spec_s] * 4 + [spec_a] * 2,
        out_specs=[spec_s, spec_s, spec_s, spec_a, spec_a],
        out_shape=[
            jax.ShapeDtypeStruct((NB, BS), jnp.float32),
            jax.ShapeDtypeStruct((NB, BS), jnp.uint8),
            jax.ShapeDtypeStruct((NB, BS), jnp.uint8),
            jax.ShapeDtypeStruct((NB, 1), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1), jnp.float32),
        ],
    )
    sec = device_loop_time(f, (g2, p2, s1, s2, am1, am2), iters=10)
    tag = "sym" if sym else "old"
    print(f"{stage:8s} TB={TB:5d} {tag}: {sec*1e3:7.2f} ms", flush=True)
    return sec


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    g2 = jnp.asarray(rng.standard_normal((NB, BS)) * 0.01, jnp.float32)
    p2 = jnp.asarray(rng.standard_normal((NB, BS)), jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, (NB, BS)), jnp.uint8)
    s2 = jnp.asarray(rng.integers(0, 256, (NB, BS)), jnp.uint8)
    am1 = jnp.asarray(rng.random((NB, 1)) * 0.01 + 1e-5, jnp.float32)
    am2 = jnp.asarray(rng.random((NB, 1)) * 0.001 + 1e-6, jnp.float32)
    data = (g2, p2, s1, s2, am1, am2)

    # canary: bf16 matmul to normalize pool speed
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
    print(f"canary 4096^3 bf16 matmul: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)")

    for stage in ("io", "dequant", "update", "full"):
        for sym in (False, True):
            if stage == "io" and sym:
                continue
            try:
                run_stage(stage, 512, sym, data)
            except Exception as e:
                print(f"{stage} sym={sym} FAILED: {str(e)[:160]}")

    for TB in (128, 256, 1024, 2048):
        try:
            run_stage("full", TB, True, data)
        except Exception as e:
            print(f"full TB={TB} FAILED: {str(e)[:160]}")

    # 32-bit reference path for the ratio target
    from bitsandbytes_tpu.functional.optim_update import optimizer_update_32bit
    m = jnp.zeros((N,), jnp.float32)
    v = jnp.zeros((N,), jnp.float32)
    gg = g2.reshape(-1)
    pp = p2.reshape(-1)

    def step32(gg, pp, m, v):
        return optimizer_update_32bit(
            "adam", gg, pp, m, v, beta1=0.9, beta2=0.999, eps=1e-8,
            step=10, lr=1e-3,
        )

    sec = device_loop_time(step32, (gg, pp, m, v), iters=10)
    print(f"32-bit adam 64M: {sec*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
