"""A/B: 8-bit Adam 64M — Pallas fused kernel vs the pure-jnp segment tier
vs the 32-bit path, INTERLEAVED (3 cycles, medians) because pool HBM
bandwidth drifts independently of the MXU canary.

Context (profile_opt8.py, probe_stream_bw.py): the Pallas kernel is
DMA-bound at ~220 GB/s — a platform ceiling for pallas_call streaming on
this stack — while plain XLA streams the identical IO at ~480 GB/s; with
segment arithmetic the LUT work is cheap fused elementwise code, so the
jnp tier can win despite the absmax-reduce fusion boundary.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
from bitsandbytes_tpu.functional import optim_update as OU
from bitsandbytes_tpu.ops import dispatch
from bitsandbytes_tpu.utils.benchmark import device_loop_time

N = 64 * 1024 * 1024
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal(N) * 0.01, jnp.float32)
p = jnp.asarray(rng.standard_normal(N), jnp.float32)
s1 = jnp.asarray(rng.integers(0, 256, N), jnp.uint8)
s2 = jnp.asarray(rng.integers(0, 256, N), jnp.uint8)
am1 = jnp.asarray(rng.random(N // 256) * 0.01 + 1e-5, jnp.float32)
am2 = jnp.asarray(rng.random(N // 256) * 0.001 + 1e-6, jnp.float32)
Q1 = jnp.asarray(create_dynamic_map(signed=True), jnp.float32)
Q2 = jnp.asarray(create_dynamic_map(signed=False), jnp.float32)

a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)


def step8(g, p, s1, s2, am1, am2):
    return OU.optimizer_update_8bit_blockwise(
        "adam", g, p, s1, s2, Q1, Q2, am1, am2,
        beta1=0.9, beta2=0.999, eps=1e-8, step=10, lr=1e-3,
    )


def timed8(backend):
    old = dispatch.backend()
    dispatch.set_backend(backend)
    try:
        return device_loop_time(step8, (g, p, s1, s2, am1, am2), iters=10)
    finally:
        dispatch.set_backend(old)


m = jnp.zeros((N,), jnp.float32)
v = jnp.zeros((N,), jnp.float32)


def step32(g, p, m, v):
    return OU.optimizer_update_32bit(
        "adam", g, p, m, v, beta1=0.9, beta2=0.999, eps=1e-8, step=10, lr=1e-3,
    )


res = {"pallas": [], "jnp-seg": [], "32bit": []}
for cyc in range(3):
    res["pallas"].append(timed8("pallas"))
    res["jnp-seg"].append(timed8("reference"))
    res["32bit"].append(device_loop_time(step32, (g, p, m, v), iters=10))
    print(f"cycle {cyc}: " + "  ".join(f"{k} {v_[-1]*1e3:6.2f}ms" for k, v_ in res.items()),
          flush=True)

meds = {k: float(np.median(v_)) for k, v_ in res.items()}
print("medians: " + "  ".join(f"{k} {s*1e3:6.2f}ms" for k, s in meds.items()), flush=True)
print(f"8bit(jnp)/32bit ratio: {meds['jnp-seg']/meds['32bit']:.3f}", flush=True)
print(f"8bit(pallas)/32bit ratio: {meds['pallas']/meds['32bit']:.3f}", flush=True)

# cross-tier agreement (Mosaic vs XLA transcendental ulps can flip codes)
out_k = None
old = dispatch.backend()
dispatch.set_backend("pallas")
out_k = jax.jit(step8)(g, p, s1, s2, am1, am2)
dispatch.set_backend("reference")
out_j = jax.jit(step8)(g, p, s1, s2, am1, am2)
dispatch.set_backend(old)
for a_, b_, nm in zip(out_k, out_j, ("p", "s1", "s2", "am1", "am2")):
    if a_ is None:
        continue
    neq = int(jnp.sum(a_ != b_))
    print(f"  {nm}: mismatches {neq}/{a_.size} ({neq/a_.size:.2e})", flush=True)
