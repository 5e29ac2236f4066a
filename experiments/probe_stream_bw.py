"""Streaming-bandwidth probe for the 8-bit optimizer kernel's IO pattern.

The stage profile (profile_opt8.py) shows the fused kernel is DMA-bound:
io-only 5.93 ms for ~1.03 GB moved = 174 GB/s on an 819 GB/s part, while
XLA's fused 32-bit Adam streams ~250 GB/s.  Hunt the gap:

  xla-add     : new_p = p + g, states passed through XLA (copies)
  xla-adam32  : the real 32-bit path (reference point)
  pallas-io   : the profile's io kernel, [TB, 256] blocks
  pallas-wide : same data viewed [NB/8, 2048] (8 quant blocks per row,
                fewer/wider DMAs per grid step)
  pallas-flat : g/p viewed [N/512, 512] f32 with states [N/512, 512] u8,
                absmax untouched ([NB,1] streamed separately)
  pallas-alias: io kernel with input_output_aliases (in-place update)

Run on the real chip; compare GB/s within one process.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bitsandbytes_tpu.utils.benchmark import device_loop_time

N = 64 * 1024 * 1024
BS = 256
NB = N // BS
BYTES = N * (4 + 4 + 1 + 1) + NB * 8 + N * 4 + N * 2 + NB * 8  # r:g,p,s1,s2,am; w:p,s1,s2,am

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((NB, BS)) * 0.01, jnp.float32)
p = jnp.asarray(rng.standard_normal((NB, BS)), jnp.float32)
s1 = jnp.asarray(rng.integers(0, 256, (NB, BS)), jnp.uint8)
s2 = jnp.asarray(rng.integers(0, 256, (NB, BS)), jnp.uint8)
am1 = jnp.asarray(rng.random((NB, 1)) * 0.01 + 1e-5, jnp.float32)
am2 = jnp.asarray(rng.random((NB, 1)) * 0.001 + 1e-6, jnp.float32)

a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)


def report(name, sec, bytes_moved=BYTES):
    print(f"{name:14s}: {sec*1e3:7.2f} ms  {bytes_moved/sec/1e9:6.0f} GB/s", flush=True)


# --- xla-add: same arrays, elementwise + passthrough copies ---
def xla_add(g, p, s1, s2, am1, am2):
    # int16 promote for the u8 bump so XLA can't alias-elide the copies
    return (p + g, (s1.astype(jnp.int16) + 1).astype(jnp.uint8),
            (s2.astype(jnp.int16) + 1).astype(jnp.uint8), am1 + 1.0, am2 + 1.0)

report("xla-add", device_loop_time(xla_add, (g, p, s1, s2, am1, am2), iters=10))

# --- pure read probe: sum everything (write ~nothing) ---
def xla_reduce(g, p, s1, s2):
    return (g.sum() + p.sum() + s1.astype(jnp.float32).sum()
            + s2.astype(jnp.float32).sum())

rb = N * 10
report("xla-reduce(r)", device_loop_time(xla_reduce, (g, p, s1, s2), iters=10), rb)


# --- pallas io kernels over three layouts ---
def io_kernel(g_ref, p_ref, s1_ref, s2_ref, np_ref, ns1_ref, ns2_ref):
    # NOTE: u8 ALU ops (s1 + 1) crash this stack's Mosaic compile helper —
    # pass states through untouched, exactly like profile_opt8's io stage
    np_ref[:] = p_ref[:] + g_ref[:]
    ns1_ref[:] = s1_ref[:]
    ns2_ref[:] = s2_ref[:]


def run_pallas(name, rows, cols, TB, donate=False):
    gv = g.reshape(rows, cols)
    pv = p.reshape(rows, cols)
    s1v = s1.reshape(rows, cols)
    s2v = s2.reshape(rows, cols)
    spec = pl.BlockSpec((TB, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kwargs = {}
    if donate:
        kwargs["input_output_aliases"] = {1: 0, 2: 1, 3: 2}
    f = pl.pallas_call(
        io_kernel,
        grid=(rows // TB,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.uint8),
            jax.ShapeDtypeStruct((rows, cols), jnp.uint8),
        ],
        **kwargs,
    )
    b = N * (4 + 4 + 1 + 1) + N * (4 + 1 + 1)
    if donate:
        jf = jax.jit(f, donate_argnums=(1, 2, 3))
        report(name, device_loop_time(jf, (gv, pv.copy(), s1v.copy(), s2v.copy()), iters=10), b)
    else:
        report(name, device_loop_time(f, (gv, pv, s1v, s2v), iters=10), b)


for TB, tag in ((512, "pallas-256c"), (2048, "pallas-256c2k")):
    try:
        run_pallas(f"{tag}", NB, BS, TB)
    except Exception as e:
        print(f"{tag} FAILED: {str(e)[:120]}", flush=True)

for cols, TB, tag in ((2048, 256, "pallas-2048c"), (2048, 512, "pallas-2048c5"),
                      (8192, 128, "pallas-8192c"), (512, 512, "pallas-512c")):
    try:
        run_pallas(tag, N // cols, cols, TB)
    except Exception as e:
        print(f"{tag} FAILED: {str(e)[:120]}", flush=True)

try:
    run_pallas("pallas-alias", NB, BS, 512, donate=True)
except Exception as e:
    print(f"pallas-alias FAILED: {str(e)[:120]}", flush=True)
