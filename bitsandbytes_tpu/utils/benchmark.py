"""Reliable on-device kernel timing.

Wall-clock timing of single dispatches is unreliable on remote/tunneled TPU
runtimes: dispatch is asynchronous and `block_until_ready` can return before
execution completes (measured: a 2000-iteration matmul loop "completed" in
0ms by block_until_ready but took 10.9s to produce its value).  Ground truth
here comes from:

  1. running the op inside one jitted `fori_loop` with a full-tensor,
     non-foldable data dependency between iterations (XLA cannot hoist or
     elide the body), and
  2. forcing completion with a host readback of the result value, and
  3. taking the *marginal* cost between a large and a small iteration count,
     which cancels dispatch/readback/pipeline-fill overheads.

This is the analog of the reference's `torch.cuda.synchronize`-based kernel
benchmarks (benchmarking/matmul_benchmark.py) done the XLA way.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["device_loop_time", "sol_fraction"]


def _make_loop(fn: Callable, n_const: int, iters: int):
    @jax.jit
    def loop(*all_args):
        const, args = all_args[:n_const], all_args[n_const:]

        def body(i, carry):
            out = fn(*const, *carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # FULL reduction of the first output leaf: consuming a single
            # element would let XLA dead-code-slice the op to just that
            # element's dependencies (observed: a matmul reduced to one
            # row-dot, "measuring" a 4096^3 bf16 matmul at 0.06 ms vs the
            # true 0.50 ms).  The reduce pass itself is one cheap read of
            # the output.
            dep = leaf.astype(jnp.float32).sum()
            # Exact zero that XLA cannot constant-fold (it cannot prove the
            # output is never NaN), so adding it is a numerical no-op while
            # making every argument depend on the previous iteration.
            zero = jnp.where(jnp.isnan(dep), dep, 0.0)

            def perturb(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    # NONLINEAR perturbation: a plain `a + zero` lets the
                    # algebraic simplifier distribute linear ops —
                    # dot(a + c, w) == dot(a, w) + c*colsum(w) — hoisting
                    # the expensive dot out of the loop (observed: a bf16
                    # 4096^3 matmul "measured" at 0.01 ms).  With
                    # `zero * sin(a)` every iteration's argument is a fresh
                    # full-rank unknown, so even a maximally-simplifying
                    # compiler must run one full op per iteration.
                    return a + zero.astype(a.dtype) * jnp.sin(a)
                return a + zero.astype(a.dtype)
            # Every argument depends on the previous iteration's output, so
            # XLA cannot hoist fn out of the loop.  Args may be arbitrary
            # pytrees (e.g. whole param trees — pass weights as args, NOT
            # closed over: closure constants are baked into the compiled
            # program, which is catastrophic for multi-GB weights).
            return tuple(jax.tree_util.tree_map(perturb, a) for a in args)

        final = jax.lax.fori_loop(0, iters, body, tuple(args))
        return jax.tree_util.tree_leaves(final)[0].ravel()[0]

    return loop


def device_loop_time(
    fn: Callable,
    args: Sequence,
    iters: int = 200,
    warmup: int = 1,
    repeats: int = 2,
    const_args: Sequence = (),
) -> float:
    """Median marginal seconds per call of ``fn(*const_args, *args)``
    measured on-device.

    Runs loops of ``iters`` and ``4*iters`` iterations; the reported time is
    ``(T_long - T_short) / (3*iters)``, which cancels fixed overheads.

    ``const_args`` are loop-invariant (e.g. weight trees): they are read by
    every iteration but not perturbed/copied (perturbing a multi-GB weight
    tree would add a full copy per iteration to the measurement).  They are
    passed as jit *arguments*, never closed over — closure constants get
    baked into the program (multi-GB constant uploads).  Only put values in
    ``const_args`` whose weight-only preprocessing (if any) may legitimately
    be hoisted out of the loop.
    """
    short = _make_loop(fn, len(const_args), iters)
    long = _make_loop(fn, len(const_args), 4 * iters)

    def run(loop):
        return float(loop(*const_args, *args))  # value readback forces completion

    for _ in range(warmup):
        run(short)
        run(long)

    results = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(short)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(long)
        t_long = time.perf_counter() - t0
        results.append(max(t_long - t_short, 1e-9) / (3 * iters))
    results.sort()
    return results[len(results) // 2]


def sol_fraction(seconds: float, bytes_accessed: float, hbm_gbps: float = 819.0) -> float:
    """Fraction of speed-of-light under an HBM-bandwidth-bound model.

    ``hbm_gbps`` defaults to TPU v5e's spec sheet (~819 GB/s); calibrate with
    a known-bound op for the actual part before quoting absolute numbers.
    """
    sol_t = bytes_accessed / (hbm_gbps * 1e9)
    return sol_t / max(seconds, 1e-12)
