"""Phase attribution for the fused-XLA 8-bit Adam tier (VERDICT r4 item 1).

The judge's arithmetic says the op runs ~112 GB/s effective vs the 32-bit
path's 292 GB/s on the same stack — ALU-bound, ~4x off its io floor.  This
profiler builds truncated variants of _optimizer_update_8bit_seg's graph
(all reading the SAME inputs; writes padded to the same byte count with
cheap passthroughs) so successive deltas attribute time to:

  io      read g/p/s1/s2/am + write p'/s1'/s2'/am'   (pure stream floor)
  dq      + segment decode of both states
  upd     + the f32 Adam math and nonfinite guard
  req1    + requant of state1 (sym trees + fixup + absmax reduce)
  full    + requant of state2 (= the shipped one-pass graph)
  nofix   full with sign-fixup disabled (fixup cost)
  2pass   the barrier-recompute two-pass variant

Each variant is its own jit (distinct static key).  Run on the real chip:
  python experiments/profile_opt8_xla.py
"""
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
from bitsandbytes_tpu.functional import optim_update as OU
from bitsandbytes_tpu.functional.dynamic_segments import build_state_tables
from bitsandbytes_tpu.utils.benchmark import device_loop_time

N = int(os.environ.get("OPT8_N", 64 * 1024 * 1024))  # small for CPU smoke
BS = 256
NB = N // BS

code1 = tuple(float(x) for x in np.asarray(create_dynamic_map(signed=True)))
code2 = tuple(float(x) for x in np.asarray(create_dynamic_map(signed=False)))
T1 = build_state_tables(code1)
T2 = build_state_tables(code2)
B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 1e-3


@functools.partial(jax.jit, static_argnums=(0,))
def variant(stage, g2, p2, c1, c2, a1, a2):
    g = g2 * 1.0
    p = p2
    if stage == "io":
        return p + g, c1, c2, a1, a2
    s1 = OU.state_dequant_blocks(c1, a1, T1, code1)
    s2 = OU.state_dequant_blocks(c2, a2, T2, code2)
    if stage == "dq":
        return p + g + s1 + s2, c1, c2, a1, a2
    new_s1 = s1 * B1 + (1 - B1) * g
    new_s2 = s2 * B2 + (1 - B2) * g * g
    cor1 = 1.0 - B1**10.0
    cor2 = float(np.sqrt(1.0 - B2**10.0))
    new_p = p + (-LR * cor2 / cor1) * (new_s1 / (jnp.sqrt(new_s2) + EPS * cor2))
    finite = jnp.isfinite(g)
    new_p = jnp.where(finite, new_p, p)
    new_s1 = jnp.where(finite, new_s1, 0.0)
    new_s2 = jnp.where(finite, new_s2, 0.0)
    if stage == "upd":
        # keep output byte count: fold f32 states into new_p, passthrough codes
        return new_p + new_s1 + new_s2, c1, c2, a1, a2
    fix = stage != "nofix"
    q1, am1 = OU.state_requant_blocks(new_s1, T1, code1, fix)
    if stage == "req1":
        # new_s2 folded into new_p to keep the f32 write count equal
        return new_p + new_s2, q1, c2, am1, a2
    q2, am2 = OU.state_requant_blocks(new_s2, T2, code2, False)
    return new_p, q1, q2, am1, am2


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    g2 = jnp.asarray(rng.standard_normal((NB, BS)) * 0.01, jnp.float32)
    p2 = jnp.asarray(rng.standard_normal((NB, BS)), jnp.float32)
    c1 = jnp.asarray(rng.integers(0, 256, (NB, BS)), jnp.uint8)
    c2 = jnp.asarray(rng.integers(0, 256, (NB, BS)), jnp.uint8)
    a1 = jnp.asarray(rng.random((NB, 1)) * 0.01 + 1e-5, jnp.float32)
    a2 = jnp.asarray(rng.random((NB, 1)) * 0.001 + 1e-6, jnp.float32)
    c1u, c2u = c1, c2

    if os.environ.get("OPT8_SKIP_CANARY") != "1":
        a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
        sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
        print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)

    def seg_step(twopass, g, p, s1, s2, am1, am2):
        return OU._optimizer_update_8bit_seg(
            "adam", g, p, s1, s2, am1, am2,
            code1_t=code1, code2_t=code2, fixup=True, twopass=twopass,
            beta1=B1, beta2=B2, eps=EPS, step=10, lr=LR,
        )

    res = {}
    for cyc in range(3):
        for stage in ("io", "dq", "upd", "req1", "full", "nofix"):
            t = device_loop_time(
                functools.partial(variant, stage), (g2, p2, c1, c2, a1, a2), iters=10
            )
            res.setdefault(stage, []).append(t)
        for nm, tp in (("ship1p", False), ("ship2p", True)):
            t = device_loop_time(
                functools.partial(seg_step, tp),
                (g2.reshape(-1), p2.reshape(-1), c1u.reshape(-1), c2u.reshape(-1),
                 a1.reshape(-1), a2.reshape(-1)),
                iters=10,
            )
            res.setdefault(nm, []).append(t)
        print(f"cycle {cyc}: " + "  ".join(f"{k} {v[-1]*1e3:6.2f}" for k, v in res.items()), flush=True)

    meds = {k: float(np.median(v)) * 1e3 for k, v in res.items()}
    print("\nmedians (ms):")
    prev = None
    for k in ("io", "dq", "upd", "req1", "full", "nofix", "ship1p", "ship2p"):
        d = f"  (+{meds[k]-prev:5.2f})" if prev is not None and k in ("dq", "upd", "req1", "full") else ""
        print(f"  {k:7s} {meds[k]:7.2f}{d}")
        if k in ("io", "dq", "upd", "req1"):
            prev = meds[k]
    io_bytes = N * (4 + 4 + 1 + 1 + 4 + 1 + 1 + 4) + NB * 4 * 4
    print(f"  stream floor: {io_bytes/1e9:.2f} GB -> "
          f"{io_bytes/(meds['io']*1e-3)/1e9:.0f} GB/s achieved on io arm")


if __name__ == "__main__":
    main()
