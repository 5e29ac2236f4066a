"""Layout bisection for the 8-bit optimizer's 2.6 ms relayout overhead.

profile_opt8_xla.py showed the FULL Adam-8bit chain runs 4.19 ms with
(NB, 256)-native inputs/outputs but the shipped fn on flat arrays takes
6.83 ms — the gap is flat<->(NB,256) layout conversion, not segment ALU
(f32 (n,) tiles as (n/128, 128) row-major; splitting 256-element blocks
across TWO lane-tiles of DIFFERENT sublanes in (NB,256) forces a physical
relayout of every big array at the jit boundary).

Arms (each the full chain: dequant s1+s2 -> Adam -> requant s1+s2+fixup):

  2dnat   (NB, 256) in/out — the conversion-free floor from the profiler
  ship    current _optimizer_update_8bit_seg on flat arrays (known 6.83)
  fl3d    flat in/out, internal reshape (NB, 2, 128), reduce over (-2,-1)
          — row-major-compatible with the (n/128, 128) tiling, so the
          reshapes should be bitcasts
  flrw    flat in/out, flat elementwise math, block absmax via
          lax.reduce_window(window=256, stride=256) + broadcast via repeat
  nat3d   natural (16384, 4096) in/out, internal reshape (NK/256, 2, 128)
  natmin  natural in/out, minor-split reshape (N, K/256, 256), reduce -1

Run on the real chip: python experiments/probe_opt8_layout.py
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
from bitsandbytes_tpu.functional.dynamic_segments import (
    build_state_tables,
    segment_decode_sym,
    segment_decode,
    segment_requant_sym,
    segment_requant,
    sign_fixup,
)
from bitsandbytes_tpu.utils.benchmark import device_loop_time

N = int(os.environ.get("OPT8_N", 64 * 1024 * 1024))
BS = 256
NB = N // BS
ROWS = 16384 if N >= 16384 * BS else N // BS
COLS = N // ROWS  # natural 2D weight shape (COLS >= BS)

code1 = tuple(float(x) for x in np.asarray(create_dynamic_map(signed=True)))
code2 = tuple(float(x) for x in np.asarray(create_dynamic_map(signed=False)))
T1 = build_state_tables(code1)
T2 = build_state_tables(code2)
B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 1e-3
COR1 = 1.0 - B1**10.0
COR2 = float(np.sqrt(1.0 - B2**10.0))


def dec(codes, table):
    f = segment_decode_sym if hasattr(table, "half") else segment_decode
    return f(codes.astype(jnp.int32), table)


def req(x, table, fix):
    f = segment_requant_sym if hasattr(table, "half") else segment_requant
    q = f(x, table)
    if fix:
        q = sign_fixup(q, x, table)
    return q.astype(jnp.uint8)


def adam_chain(g, p, c1, c2, am1b, am2b, reduce_fn):
    """Full chain on arrays of ANY matching shape.  ``am1b/am2b`` are the
    absmaxes pre-broadcast to g's shape; ``reduce_fn(x)`` returns the new
    block absmax broadcast back to g's shape (plus the compact form)."""
    s1 = dec(c1, T1) * am1b
    s2 = dec(c2, T2) * am2b
    new_s1 = s1 * B1 + (1 - B1) * g
    new_s2 = s2 * B2 + (1 - B2) * g * g
    new_p = p + (-LR * COR2 / COR1) * (new_s1 / (jnp.sqrt(new_s2) + EPS * COR2))
    finite = jnp.isfinite(g)
    new_p = jnp.where(finite, new_p, p)
    new_s1 = jnp.where(finite, new_s1, 0.0)
    new_s2 = jnp.where(finite, new_s2, 0.0)
    amb1, am1 = reduce_fn(new_s1)
    amb2, am2 = reduce_fn(new_s2)
    q1 = req(jnp.clip(new_s1 / amb1, -1.0, 1.0), T1, True)
    q2 = req(jnp.clip(new_s2 / amb2, -1.0, 1.0), T2, False)
    return new_p, q1, q2, am1, am2


def red_axes(axes):
    def f(x):
        am = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
        am = jnp.maximum(am, 1e-12)
        return jnp.broadcast_to(am, x.shape), am
    return f


@jax.jit
def arm_2dnat(g, p, c1, c2, a1, a2):
    return adam_chain(g, p, c1, c2, a1, a2, red_axes((-1,)))


@jax.jit
def arm_fl3d(g, p, c1, c2, a1, a2):
    # flat in -> (NB, 2, 128): major-split of the row-major (n/128, 128)
    # tiling; should be a bitcast
    t = lambda x: x.reshape(NB, 2, 128)  # noqa: E731
    out = adam_chain(
        t(g), t(p), t(c1), t(c2),
        a1.reshape(NB, 1, 1), a2.reshape(NB, 1, 1), red_axes((-2, -1)),
    )
    return (out[0].reshape(-1), out[1].reshape(-1), out[2].reshape(-1),
            out[3].reshape(-1), out[4].reshape(-1))


@jax.jit
def arm_flrw(g, p, c1, c2, a1, a2):
    # flat everywhere; block reduce via reduce_window, broadcast via repeat
    def rw(x):
        am = jax.lax.reduce_window(
            jnp.abs(x), -jnp.inf, jax.lax.max, (BS,), (BS,), "VALID"
        )
        am = jnp.maximum(am, 1e-12)
        return jnp.repeat(am, BS), am
    a1b = jnp.repeat(a1, BS)
    a2b = jnp.repeat(a2, BS)
    return adam_chain(g, p, c1, c2, a1b, a2b, rw)


@jax.jit
def arm_nat3d(g, p, c1, c2, a1, a2):
    t = lambda x: x.reshape(NB, 2, 128)  # noqa: E731
    out = adam_chain(
        t(g), t(p), t(c1), t(c2),
        a1.reshape(NB, 1, 1), a2.reshape(NB, 1, 1), red_axes((-2, -1)),
    )
    return (out[0].reshape(ROWS, COLS), out[1].reshape(ROWS, COLS),
            out[2].reshape(ROWS, COLS), out[3], out[4])


@jax.jit
def arm_hyb_flat(g, p, c1, c2, a1, a2):
    # states (NB,256)-native in/out; g/p/new_p FLAT; join via reshape of
    # the decoded/requant INTERMEDIATES (fusion-internal index transforms?)
    s1 = (dec(c1, T1) * a1).reshape(-1)
    s2 = (dec(c2, T2) * a2).reshape(-1)
    new_s1 = s1 * B1 + (1 - B1) * g
    new_s2 = s2 * B2 + (1 - B2) * g * g
    new_p = p + (-LR * COR2 / COR1) * (new_s1 / (jnp.sqrt(new_s2) + EPS * COR2))
    finite = jnp.isfinite(g)
    new_p = jnp.where(finite, new_p, p)
    new_s1 = jnp.where(finite, new_s1, 0.0).reshape(NB, BS)
    new_s2 = jnp.where(finite, new_s2, 0.0).reshape(NB, BS)
    rf = red_axes((-1,))
    amb1, am1 = rf(new_s1)
    amb2, am2 = rf(new_s2)
    q1 = req(jnp.clip(new_s1 / amb1, -1.0, 1.0), T1, True)
    q2 = req(jnp.clip(new_s2 / amb2, -1.0, 1.0), T2, False)
    return new_p, q1, q2, am1, am2


@jax.jit
def arm_hyb_rel(g, p, c1, c2, a1, a2):
    # states (NB,256)-native; g/p relayouted to (NB,256) INSIDE the jit —
    # pays the boundary relayout for the three f32 arrays only
    g2, p2 = g.reshape(NB, BS), p.reshape(NB, BS)
    out = adam_chain(g2, p2, c1, c2, a1, a2, red_axes((-1,)))
    return (out[0].reshape(-1),) + out[1:]


@jax.jit
def arm_tile4k(g, p, c1, c2, a1, a2):
    # BITCAST-TRUE blocked view of flat arrays: flat f32 is {0:T(1024)}
    # (linear 8x128 tiles) and flat uint8 {0:T(4096)}, so the 3D shape
    # (n/4096, 32, 128) is physically IDENTICAL to flat for both dtypes
    # (leading dims row-major, last two dims one/four whole tiles).  A
    # 256-element block = 2 adjacent sublanes; its absmax is a lane reduce
    # + a pairwise sublane fold on a TINY (n/4096, 32) array.
    S = (N // 4096, 32, 128)
    t = lambda x: x.reshape(S)  # noqa: E731

    def rf(x):
        am_s = jnp.max(jnp.abs(x), axis=2)           # (n/4096, 32)
        am_b = jnp.max(am_s.reshape(S[0], 16, 2), axis=2)  # (n/4096, 16) blocks
        am_b = jnp.maximum(am_b, 1e-12)
        amb = jnp.repeat(am_b, 2, axis=1)[:, :, None]  # (n/4096, 32, 1)
        return jnp.broadcast_to(amb, x.shape), am_b

    a1b = jnp.broadcast_to(
        jnp.repeat(a1.reshape(S[0], 16), 2, axis=1)[:, :, None], S
    )
    a2b = jnp.broadcast_to(
        jnp.repeat(a2.reshape(S[0], 16), 2, axis=1)[:, :, None], S
    )
    out = adam_chain(t(g), t(p), t(c1), t(c2), a1b, a2b, rf)
    return (out[0].reshape(-1), out[1].reshape(-1), out[2].reshape(-1),
            out[3].reshape(-1), out[4].reshape(-1))


@jax.jit
def arm_natrw(g, p, c1, c2, a1, a2):
    # natural (R, C) in/out; block absmax via reduce_window on the minor
    # axis (no reshape of any big array), broadcast back via minor repeat
    def rf(x):
        am = jax.lax.reduce_window(
            jnp.abs(x), -jnp.inf, jax.lax.max, (1, BS), (1, BS), "VALID"
        )
        am = jnp.maximum(am, 1e-12)
        return jnp.repeat(am, BS, axis=1), am
    a1b = jnp.repeat(a1.reshape(ROWS, COLS // BS), BS, axis=1)
    a2b = jnp.repeat(a2.reshape(ROWS, COLS // BS), BS, axis=1)
    return adam_chain(g, p, c1, c2, a1b, a2b, rf)


@jax.jit
def arm_natmin(g, p, c1, c2, a1, a2):
    # minor-dim split only: (R, C) -> (R, C/256, 256)
    t = lambda x: x.reshape(ROWS, COLS // BS, BS)  # noqa: E731
    out = adam_chain(
        t(g), t(p), t(c1), t(c2),
        a1.reshape(ROWS, COLS // BS, 1), a2.reshape(ROWS, COLS // BS, 1),
        red_axes((-1,)),
    )
    return (out[0].reshape(ROWS, COLS), out[1].reshape(ROWS, COLS),
            out[2].reshape(ROWS, COLS), out[3], out[4])


def main():
    print("backend:", jax.default_backend(), flush=True)

    # generate ON DEVICE: uploading 640 MB of host arrays through the axon
    # tunnel costs minutes and starves the probe's timeout
    @jax.jit
    def gen():
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        gf = jax.random.normal(ks[0], (N,), jnp.float32) * 0.01
        pf = jax.random.normal(ks[1], (N,), jnp.float32)
        c1f = jax.random.randint(ks[2], (N,), 0, 256, jnp.int32).astype(jnp.uint8)
        c2f = jax.random.randint(ks[3], (N,), 0, 256, jnp.int32).astype(jnp.uint8)
        a1 = jax.random.uniform(ks[4], (NB,), jnp.float32) * 0.01 + 1e-5
        a2 = jax.random.uniform(ks[5], (NB,), jnp.float32) * 0.001 + 1e-6
        return gf, pf, c1f, c2f, a1, a2

    gf, pf, c1f, c2f, a1, a2 = jax.block_until_ready(gen())
    print("data ready", flush=True)

    rng = np.random.default_rng(0)
    if os.environ.get("OPT8_SKIP_CANARY") != "1":
        a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
        sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
        print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)

    def seg_ship(g, p, s1, s2, am1, am2):
        return OU._optimizer_update_8bit_seg(
            "adam", g, p, s1, s2, am1, am2,
            code1_t=code1, code2_t=code2, fixup=True, twopass=False,
            beta1=B1, beta2=B2, eps=EPS, step=10, lr=LR,
        )

    arms = {
        "2dnat": (arm_2dnat, lambda: (gf.reshape(NB, BS), pf.reshape(NB, BS),
                                      c1f.reshape(NB, BS), c2f.reshape(NB, BS),
                                      a1.reshape(NB, 1), a2.reshape(NB, 1))),
        "ship": (seg_ship, lambda: (gf, pf, c1f, c2f, a1, a2)),
        "hyb_flat": (arm_hyb_flat, lambda: (gf, pf,
                                            c1f.reshape(NB, BS), c2f.reshape(NB, BS),
                                            a1.reshape(NB, 1), a2.reshape(NB, 1))),
        "hyb_rel": (arm_hyb_rel, lambda: (gf, pf,
                                          c1f.reshape(NB, BS), c2f.reshape(NB, BS),
                                          a1.reshape(NB, 1), a2.reshape(NB, 1))),
        "tile4k": (arm_tile4k, lambda: (gf, pf, c1f, c2f, a1, a2)),
        "natrw": (arm_natrw, lambda: (gf.reshape(ROWS, COLS), pf.reshape(ROWS, COLS),
                                      c1f.reshape(ROWS, COLS), c2f.reshape(ROWS, COLS),
                                      a1, a2)),
    }
    if os.environ.get("OPT8_ALL_ARMS") == "1":
        arms.update({
            "fl3d": (arm_fl3d, lambda: (gf, pf, c1f, c2f, a1, a2)),
            "flrw": (arm_flrw, lambda: (gf, pf, c1f, c2f, a1, a2)),
            "nat3d": (arm_nat3d, lambda: (gf.reshape(ROWS, COLS), pf.reshape(ROWS, COLS),
                                          c1f.reshape(ROWS, COLS), c2f.reshape(ROWS, COLS),
                                          a1, a2)),
            "natmin": (arm_natmin, lambda: (gf.reshape(ROWS, COLS), pf.reshape(ROWS, COLS),
                                            c1f.reshape(ROWS, COLS), c2f.reshape(ROWS, COLS),
                                            a1, a2)),
        })
    res = {}
    for cyc in range(3):
        for name, (fn, mk) in arms.items():
            t = device_loop_time(fn, mk(), iters=10)
            res.setdefault(name, []).append(t)
        print(f"cycle {cyc}: " + "  ".join(f"{k} {v[-1]*1e3:6.2f}" for k, v in res.items()),
              flush=True)
    print("\nmedians (ms): " + "  ".join(
        f"{k} {float(np.median(v))*1e3:6.2f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
