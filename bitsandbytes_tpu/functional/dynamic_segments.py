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
    "SymSegmentTable",
    "build_segments",
    "build_segments_sym",
    "build_state_tables",
    "segment_decode",
    "segment_requant",
    "segment_decode_sym",
    "segment_requant_sym",
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
    # Intercept forms (VPU-op reductions; None when the f32 verification
    # below rejects them and the callers use the 3-tree forms instead):
    # decode  value = idx * step + b_dec   (one tree fewer than
    #         (idx - start) * step + first; verified bit-exact per entry)
    # requant j = floor(x * inv + b_req)   (b_req = 0.5 - first*inv;
    #         verified self-roundtrip per entry)
    b_dec: Optional[Tuple[float, ...]] = None
    b_req: Optional[Tuple[float, ...]] = None


class SymSegmentTable(NamedTuple):
    """Odd-symmetric codebook (``c[z-j] == -c[z+j]`` exactly, ``c[z]==0``):
    LUT work runs on the positive HALF map (half the segments => half the
    select-tree depth) with a mirror/sign wrapper.  The signed dynamic map
    (functional/codebooks.create_dynamic_map) satisfies this exactly."""

    half: SegmentTable   # segment table over c[z:] (half-indices j >= 0)
    zero_idx: int        # z: index of the 0.0 entry in the full map
    n: int               # full map size


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

    # -- intercept forms, each attached only if f32-verified -----------------
    f32 = np.float32
    b_dec, b_req = [], []
    dec_ok = req_ok = True
    for (s, cnt), first, step, inv in zip(segments, firsts, steps, inv_steps):
        bd = f32(f32(first) - f32(s) * f32(step))  # value = idx*step + bd
        idxs = np.arange(s, s + cnt, dtype=np.float32)
        recon = (idxs * f32(step)).astype(np.float32) + bd
        if not np.array_equal(recon.astype(np.float32), c[s : s + cnt]):
            dec_ok = False
        b_dec.append(float(bd))
        # NOTE: x*inv + br is not bit-equivalent to (x-first)*inv + 0.5 for
        # arbitrary x — the different f32 rounding order flips the code for
        # x within ~1 ulp of a slot midpoint (measured ~1.3 ppm of uniform
        # draws over the dynamic maps).  Both tiers (oracle + Pallas kernel)
        # share this function, so kernel/oracle bit-exactness is unaffected;
        # vs the reference's torch.bucketize the flips land inside the
        # existing tie budget (test_reference_parity: <0.05%, measured
        # ~0.005% before this form).  The entry-roundtrip check below only
        # guards exact codebook values.
        br = f32(f32(0.5) - f32(first) * f32(inv))  # j = floor(x*inv + br)
        t = (c[s : s + cnt] * f32(inv)).astype(np.float32) + br
        j_back = np.clip(np.floor(t.astype(np.float32)), 0, cnt - 1).astype(int)
        if not np.array_equal(j_back, np.arange(cnt)):
            req_ok = False
        b_req.append(float(br))

    return SegmentTable(
        starts=tuple(sts),
        counts=tuple(cnts),
        firsts=tuple(firsts),
        steps=tuple(steps),
        inv_steps=tuple(inv_steps),
        bounds=tuple(bounds),
        zero_idx=int(np.abs(c).argmin()),
        signed=bool(c[0] < 0),
        b_dec=tuple(b_dec) if dec_ok else None,
        b_req=tuple(b_req) if req_ok else None,
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
    """int codes -> f32 values via per-segment linear reconstruction.

    Intercept form (``idx*step + b``, one constant tree fewer) when the
    build-time f32 verification accepted it; 3-tree form otherwise."""
    idx = idx.astype(jnp.int32)
    masks = _seg_masks_from_idx(idx, table)
    step = _const_tree(masks, [np.float32(s) for s in table.steps], jnp.float32)
    if table.b_dec is not None:
        b = _const_tree(masks, [np.float32(v) for v in table.b_dec], jnp.float32)
        return idx.astype(jnp.float32) * step + b
    start = _const_tree(masks, [np.int32(s) for s in table.starts], jnp.int32)
    first = _const_tree(masks, [np.float32(f) for f in table.firsts], jnp.float32)
    return (idx - start).astype(jnp.float32) * step + first


def _start_cnt_tree(masks, table: SegmentTable):
    """start and count-1 packed into ONE int tree (start<<9 | cnt-1; both
    < 512 for 256-entry maps), halving the int-tree select work."""
    packed = [np.int32((s << 9) | (c - 1)) for s, c in zip(table.starts, table.counts)]
    w = _const_tree(masks, packed, jnp.int32)
    return jax.lax.shift_right_logical(w, 9), w & 511


def segment_requant(x, table: SegmentTable):
    """f32 values (pre-scaled to the codebook range) -> int32 codes.

    Semantics: segment by boundary-midpoint compare, then round to the
    nearest slot on the segment's uniform grid (half-up in index space).
    """
    masks = _seg_masks_from_val(x, table)
    start, cnt1 = _start_cnt_tree(masks, table)
    inv = _const_tree(masks, [np.float32(v) for v in table.inv_steps], jnp.float32)
    if table.b_req is not None:
        b = _const_tree(masks, [np.float32(v) for v in table.b_req], jnp.float32)
        t = x * inv + b
    else:
        first = _const_tree(masks, [np.float32(f) for f in table.firsts], jnp.float32)
        t = (x - first) * inv + 0.5
    j = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, cnt1)
    return start + j


# -- odd-symmetric (sym) wrappers -------------------------------------------


@functools.lru_cache(maxsize=None)
def _build_segments_sym_cached(code_t: Tuple[float, ...]) -> Optional[SymSegmentTable]:
    c = np.asarray(code_t, dtype=np.float32)
    n = c.size
    z = int(np.abs(c).argmin())
    # need: exact zero entry, every negative the exact mirror of a positive
    if z == 0 or c[z] != 0.0 or z > n - 1 - z:
        return None
    j = np.arange(1, z + 1)
    if not np.array_equal(c[z - j], -c[z + j]):
        return None
    half = _build_segments_cached(tuple(float(x) for x in c[z:]))
    if half is None or len(half.starts) < 2:
        return None
    return SymSegmentTable(half=half, zero_idx=z, n=n)


def build_segments_sym(code) -> Optional[SymSegmentTable]:
    arr = np.asarray(code, dtype=np.float32).reshape(-1)
    return _build_segments_sym_cached(tuple(float(x) for x in arr))


def segment_decode_sym(idx, t: SymSegmentTable):
    """int codes -> f32 values through the half map: ``|idx - z|`` decodes
    on half-depth trees, then the sign of ``idx - z`` is applied."""
    d = idx.astype(jnp.int32) - np.int32(t.zero_idx)
    a = jnp.abs(d)
    v = segment_decode(a, t.half)
    return jnp.where(d < 0, -v, v)


def segment_requant_sym(x, t: SymSegmentTable):
    """f32 values -> int32 codes through the half map: requantize ``|x|``
    on half-depth trees, mirror the grid slot back for negatives.

    Tie behavior differs from the full-map path only exactly AT segment
    midpoints of negative values (half-up in magnitude instead of half-up
    in signed index) — measure-zero; both tiers share this path so they
    remain bit-identical to each other."""
    neg = jnp.signbit(x)
    jg = segment_requant(jnp.abs(x), t.half)
    # negatives have z mirror slots (the positive half may have one more
    # entry, e.g. the dynamic map's +1.0 at index 255) — clamp, then mirror
    jn = jnp.minimum(jg, np.int32(t.zero_idx))
    return np.int32(t.zero_idx) + jnp.where(neg, -jn, jg)


def build_state_tables(code):
    """Best available LUT structure for an optimizer-state codebook:
    SymSegmentTable (half-depth trees) > SegmentTable > None (callers fall
    back to trees/compare-chains)."""
    sym = build_segments_sym(code)
    if sym is not None:
        return sym
    return build_segments(code)


def sign_fixup(idx, x, table):
    """Reference kernels.cu:1118-1133: when ``signbit(code[idx]) !=
    signbit(x)``, bump the code toward x's sign (sorted map: +1 toward
    positive, -1 toward negative).  Only meaningful for signed maps.
    Accepts SegmentTable or SymSegmentTable."""
    if isinstance(table, SymSegmentTable):
        table = SegmentTable(
            starts=(), counts=(), firsts=(), steps=(), inv_steps=(),
            bounds=(), zero_idx=table.zero_idx, signed=True,
        )
    if not table.signed:
        return idx
    # signbit(code[idx]): entries below zero_idx are negative; zero (stored
    # as +0.0) and positives are not.
    code_neg = idx < np.int32(table.zero_idx)
    x_neg = jnp.signbit(x)
    mismatch = code_neg != x_neg
    return jnp.where(mismatch, jnp.where(x_neg, idx - 1, idx + 1), idx)
