"""Piecewise-linear segment arithmetic for 256-entry dynamic codebooks.

The dynamic 8-bit map (reference functional.py:296-348) is, by construction,
piecewise *linear*: within each (sign, exponent) group the values are the
midpoints of a `linspace(0.1, 1, 2^k+1)` scaled by a power of ten — uniform
spacing.  Sorted, the 256-entry map decomposes into ~16 uniform segments.

That structure turns the 8-bit optimizer state LUT work from 256-entry
trees/compare-chains (~500 VPU ops/element) into segment arithmetic
(~60 ops/element):

* decode:  ``value = (idx - seg_start) * seg_step + seg_first`` after a
  4/5-level select tree over segment boundaries (conditions on the integer
  code, shared across the constant trees).
* requant: find the segment of ``x`` by comparing against the segment
  *boundary midpoints* (the exact f32 midpoints between the last/first
  codebook entries of adjacent segments), then
  ``j = clamp(floor((x - seg_first) / seg_step + 0.5), 0, seg_count-1)``.

Both tiers (the jnp oracle in functional/optim_update.py and the Pallas
kernel in ops/pallas/optim8bit.py) call THESE functions, so they remain
bit-identical to each other.  Relative to gather-against-the-true-table
semantics the arithmetic differs by <= ~2 ulp on decode (the reference's
torch-linspace tables carry 1-ulp jitter that a single slope cannot
represent) and by the tie behavior exactly at quantization midpoints —
both measure-zero against the reference-parity error budgets.

`build_segments` is generic: it detects uniform runs numerically and
*verifies* the reconstruction error of every entry; codebooks that are not
piecewise-linear (custom qmaps) return None and the callers fall back to
the tree/compare path.

Sign-preservation fixup (reference csrc/kernels.cu:1118-1133): after
requantization, if the sign of the quantized slot differs from the sign of
the true value, bump the code by +/-1 toward the true sign.  Applied by
callers to signed states only, exactly as the CUDA kernel does.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SegmentTable",
    "build_segments",
    "segment_decode",
    "segment_requant",
    "sign_fixup",
]


class SegmentTable(NamedTuple):
    """Static (hashable) description of a piecewise-linear codebook."""

    starts: Tuple[int, ...]      # first code index of each segment
    counts: Tuple[int, ...]      # entries per segment
    firsts: Tuple[float, ...]    # code[start] per segment (f32 values)
    steps: Tuple[float, ...]     # uniform spacing per segment (f32)
    inv_steps: Tuple[float, ...]  # 1/step (f32; 0.0 for singletons)
    bounds: Tuple[float, ...]    # len-1 segment boundary midpoints (f32)
    zero_idx: int                # index of the entry closest to 0
    signed: bool                 # True if the map contains negative values


@functools.lru_cache(maxsize=None)
def _build_segments_cached(code_t: Tuple[float, ...]) -> Optional[SegmentTable]:
    c = np.asarray(code_t, dtype=np.float32)
    n = c.size
    if n < 4 or not np.all(np.diff(c.astype(np.float64)) > 0):
        return None

    c64 = c.astype(np.float64)
    d = np.diff(c64)

    # Greedy maximal uniform-run segmentation: each segment's entries share
    # one spacing (within 1e-3 rel); every entry lands in exactly one
    # segment.  Correctness does not depend on the greedy choice — the f32
    # reconstruction check below rejects any bad split.
    segments = []  # (start, count)
    s = 0
    while s < n:
        if s == n - 1:
            segments.append((s, 1))
            break
        step = d[s]
        e = s + 1
        while e + 1 <= n - 1 and abs(d[e] - step) <= 1e-3 * abs(step):
            e += 1
        segments.append((s, e - s + 1))
        s = e + 1

    if len(segments) > 40:  # not piecewise-linear enough to pay off
        return None

    firsts, steps, inv_steps, cnts, sts = [], [], [], [], []
    for s, cnt in segments:
        first = float(c[s])
        if cnt > 1:
            step64 = (c64[s + cnt - 1] - c64[s]) / (cnt - 1)
            step = float(np.float32(step64))
            inv = float(np.float32(1.0 / step64))
            # verify reconstruction of every entry in f32 arithmetic
            js = np.arange(cnt, dtype=np.float32)
            recon = js * np.float32(step) + np.float32(first)
            err = np.abs(recon.astype(np.float64) - c64[s : s + cnt])
            tol = np.maximum(np.abs(c64[s : s + cnt]), 1e-30) * 5e-6 + 1e-12
            if np.any(err > tol):
                return None
            # verify requant round-trip in f32: every entry maps to itself
            t = (c[s : s + cnt] - np.float32(first)) * np.float32(inv) + np.float32(0.5)
            j_back = np.clip(np.floor(t.astype(np.float32)), 0, cnt - 1).astype(int)
            if not np.array_equal(j_back, np.arange(cnt)):
                return None
        else:
            step, inv = 0.0, 0.0
        firsts.append(first)
        steps.append(step)
        inv_steps.append(inv)
        cnts.append(cnt)
        sts.append(s)

    bounds = []
    for k in range(len(segments) - 1):
        s_next = segments[k + 1][0]
        lo = c64[s_next - 1]
        hi = c64[s_next]
        bounds.append(float(np.float32((lo + hi) * 0.5)))

    return SegmentTable(
        starts=tuple(sts),
        counts=tuple(cnts),
        firsts=tuple(firsts),
        steps=tuple(steps),
        inv_steps=tuple(inv_steps),
        bounds=tuple(bounds),
        zero_idx=int(np.abs(c).argmin()),
        signed=bool(c[0] < 0),
    )


def build_segments(code) -> Optional[SegmentTable]:
    """Segment table for a sorted codebook, or None if not piecewise-linear.

    ``code`` must be a concrete (non-traced) array.
    """
    arr = np.asarray(code, dtype=np.float32).reshape(-1)
    return _build_segments_cached(tuple(float(x) for x in arr))


def _const_tree(cond_masks, leaves, dtype):
    """Select among ``leaves`` (compile-time constants) with a binary tree
    whose level conditions are precomputed boolean masks keyed by segment
    index ranges.  ``cond_masks[k]`` is the mask 'in segments >= k+1'."""
    if len(leaves) == 1:
        return jnp.asarray(leaves[0], dtype=dtype)

    def tree(lo, hi):
        if hi - lo == 1:
            return jnp.full(cond_masks[0].shape, leaves[lo], dtype=dtype)
        mid = (lo + hi) // 2
        return jnp.where(cond_masks[mid - 1], tree(mid, hi), tree(lo, mid))

    return tree(0, len(leaves))


def _seg_masks_from_idx(idx, table: SegmentTable):
    """cond_masks[k] = (idx >= starts[k+1]) — shared by all constant trees."""
    return [idx >= np.int32(s) for s in table.starts[1:]]


def _seg_masks_from_val(x, table: SegmentTable):
    """cond_masks[k] = (x > bounds[k]) — value-space segment search.

    Strict '>' so a value exactly at a boundary midpoint goes to the LOWER
    segment, matching '#{midpoints < x}' bucketize-left semantics.
    """
    return [x > np.float32(b) for b in table.bounds]


def segment_decode(idx, table: SegmentTable):
    """int codes -> f32 values via per-segment linear reconstruction."""
    idx = idx.astype(jnp.int32)
    masks = _seg_masks_from_idx(idx, table)
    start = _const_tree(masks, [np.int32(s) for s in table.starts], jnp.int32)
    first = _const_tree(masks, [np.float32(f) for f in table.firsts], jnp.float32)
    step = _const_tree(masks, [np.float32(s) for s in table.steps], jnp.float32)
    return (idx - start).astype(jnp.float32) * step + first


def segment_requant(x, table: SegmentTable):
    """f32 values (pre-scaled to the codebook range) -> int32 codes.

    Semantics: segment by boundary-midpoint compare, then round to the
    nearest slot on the segment's uniform grid (half-up in index space).
    """
    masks = _seg_masks_from_val(x, table)
    start = _const_tree(masks, [np.int32(s) for s in table.starts], jnp.int32)
    first = _const_tree(masks, [np.float32(f) for f in table.firsts], jnp.float32)
    inv = _const_tree(masks, [np.float32(v) for v in table.inv_steps], jnp.float32)
    cnt1 = _const_tree(masks, [np.int32(c - 1) for c in table.counts], jnp.int32)
    t = (x - first) * inv + 0.5
    j = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, cnt1)
    return start + j


def sign_fixup(idx, x, table: SegmentTable):
    """Reference kernels.cu:1118-1133: when ``signbit(code[idx]) !=
    signbit(x)``, bump the code toward x's sign (sorted map: +1 toward
    positive, -1 toward negative).  Only meaningful for signed maps."""
    if not table.signed:
        return idx
    # signbit(code[idx]): entries below zero_idx are negative; zero (stored
    # as +0.0) and positives are not.
    code_neg = idx < np.int32(table.zero_idx)
    x_neg = jnp.signbit(x)
    mismatch = code_neg != x_neg
    return jnp.where(mismatch, jnp.where(x_neg, idx - 1, idx + 1), idx)
