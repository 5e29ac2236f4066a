"""A/B: 8-bit Adam 64M — single-pass vs two-pass (barrier-recompute) requant
in the fused-XLA segment tier, interleaved with the 32-bit path
(VERDICT r3 item 4: close the 8-bit optimizer to <=1.0x of 32-bit).

The single-pass route lets XLA materialize the new f32 state values
between the block-absmax reduce and the requant consumer (a reduce cannot
fuse with a consumer that re-reads its input), costing ~16 extra bytes/
param of HBM traffic for Adam.  The two-pass route computes absmax in
pass A (emitting only new_p + [NB] absmaxes) and RECOMPUTES the update
chain from the raw ~10 bytes/param of inputs behind an
optimization_barrier in pass B.  Bit-identical by construction (verified
in-process below and cross-process in the commit).

Round-5 fix (ADVICE r4): the variant is now passed as an EXPLICIT STATIC
argument to _optimizer_update_8bit_seg, so each arm gets its own pjit
cache entry.  The round-4 version of this harness set an env var that the
jitted fn read at trace time — the second arm silently reused the first
arm's compiled graph, so both "variants" (and the bit-identity check)
measured the same one-pass code.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
from bitsandbytes_tpu.functional import optim_update as OU
from bitsandbytes_tpu.utils.benchmark import device_loop_time

N = 64 * 1024 * 1024
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


@jax.jit
def _gen():  # on-device: a 640 MB host upload starves the timeout
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    return (
        jax.random.normal(ks[0], (N,), jnp.float32) * 0.01,
        jax.random.normal(ks[1], (N,), jnp.float32),
        jax.random.randint(ks[2], (N,), 0, 256, jnp.int32).astype(jnp.uint8),
        jax.random.randint(ks[3], (N,), 0, 256, jnp.int32).astype(jnp.uint8),
        jax.random.uniform(ks[4], (N // 256,), jnp.float32) * 0.01 + 1e-5,
        jax.random.uniform(ks[5], (N // 256,), jnp.float32) * 0.001 + 1e-6,
    )


g, p, s1, s2, am1, am2 = jax.block_until_ready(_gen())
code1 = tuple(float(x) for x in np.asarray(create_dynamic_map(signed=True)))
code2 = tuple(float(x) for x in np.asarray(create_dynamic_map(signed=False)))

a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)


def step8(twopass, layout, g, p, s1, s2, am1, am2):
    return OU._optimizer_update_8bit_seg(
        "adam", g, p, s1, s2, am1, am2,
        code1_t=code1, code2_t=code2, fixup=True, twopass=twopass,
        layout=layout,
        beta1=0.9, beta2=0.999, eps=1e-8, step=10, lr=1e-3,
    )


def timed8(twopass: bool, layout: str = "tile4k"):
    import functools
    return device_loop_time(
        functools.partial(step8, twopass, layout), (g, p, s1, s2, am1, am2), iters=10
    )


m = jnp.zeros((N,), jnp.float32)
v = jnp.zeros((N,), jnp.float32)


def step32(g, p, m, v):
    return OU.optimizer_update_32bit(
        "adam", g, p, m, v, beta1=0.9, beta2=0.999, eps=1e-8, step=10, lr=1e-3,
    )


res = {"onepass": [], "twopass": [], "2dlayout": [], "32bit": []}
for cyc in range(3):
    res["onepass"].append(timed8(False))
    res["twopass"].append(timed8(True))
    res["2dlayout"].append(timed8(False, "2d"))  # pre-round-5 (NB,256) form
    res["32bit"].append(device_loop_time(step32, (g, p, m, v), iters=10))
    print(
        f"cycle {cyc}: "
        + "  ".join(f"{k} {v_[-1]*1e3:6.2f}ms" for k, v_ in res.items()),
        flush=True,
    )

meds = {k: float(np.median(v_)) for k, v_ in res.items()}
print("medians: " + "  ".join(f"{k} {s*1e3:6.2f}ms" for k, s in meds.items()))
print(f"onepass/32bit: {meds['onepass']/meds['32bit']:.3f}")
print(f"twopass/32bit: {meds['twopass']/meds['32bit']:.3f}")
print(f"2dlayout/32bit: {meds['2dlayout']/meds['32bit']:.3f}", flush=True)

# bit-identity on-device (distinct compiled variants by construction now)
o1 = step8(False, "tile4k", g, p, s1, s2, am1, am2)
o2 = step8(True, "tile4k", g, p, s1, s2, am1, am2)
o3 = step8(False, "2d", g, p, s1, s2, am1, am2)
for a_, b_, nm in zip(o1, o3, ("p", "s1", "s2", "am1", "am2")):
    if a_ is None:
        continue
    neq = int(jnp.sum(a_ != b_))
    print(f"  tile4k-vs-2d {nm}: mismatches {neq}/{a_.size}", flush=True)
for a_, b_, nm in zip(o1, o2, ("p", "s1", "s2", "am1", "am2")):
    if a_ is None:
        continue
    neq = int(jnp.sum(a_ != b_))
    print(f"  {nm}: mismatches {neq}/{a_.size}", flush=True)
