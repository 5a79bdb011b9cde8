"""Trustworthy timing on the axon TPU tunnel.

Two documented pathologies make naive timing wrong on this runtime
(bench/pallas_dma_hang.md; VERDICT r3 "physically implausible" finding):

  1. ``jax.block_until_ready`` does NOT reliably fence: after Mosaic
     kernels have executed in the process it can return at *dispatch*
     time (measured: 20 x 268 MB axpy "completing" in 0.72 ms — pure
     Python dispatch cost, implying 14.8 TB/s on a 0.82 TB/s chip).
  2. Every true sync costs a ~30-60 ms tunnel round-trip, so
     ``(time for k ops + sync) / k`` overestimates fast ops at small k.

The cures, used together here:

  * **true fence** = device->host fetch of a scalar that data-depends on
    the result.  The d2h read must wait for the producer buffer and the
    returned value proves execution happened (we check it is finite).
  * **slope timing**: run k_lo and k_hi reps, each ended by a true
    fence; per-op time = (t_hi - t_lo) / (k_hi - k_lo).  The constant
    round-trip cancels.  Dispatch is cheap (~30 us) relative to any op
    this repo times (>= 100 us), and the device queue drains serially,
    so the slope is device execution time.

Compare: the reference times with a plain wall clock around a
single-thread loop (/root/reference/include/visitors/standard_visitor.hxx
timing) — correct on a CPU, meaningless over an async tunnel.
"""
from __future__ import annotations

import time


def make_fence(probe):
    """Return fence() -> float performing a true d2h sync.

    ``probe()`` must return a jax scalar (or tiny array) that
    data-depends on the state being timed.  Keep it cheap: it runs once
    per timing leg, not per op.
    """
    import numpy as np

    def fence():
        v = float(np.asarray(probe()))
        if v != v:  # NaN — numerical blowup would invalidate the timing
            raise FloatingPointError("fence probe returned NaN")
        return v
    return fence


def slope_time(step, fence, k_lo: int = 5, k_hi: int = 25, nchunks: int = 5,
               repeats: int = 2, min_delta: float = 0.35,
               max_ops: int = 100_000):
    """Per-op seconds of ``step()`` by two-point slope with true fences.

    Both legs issue exactly ``nchunks`` fences (so the fixed per-fence
    round-trip cancels in the slope) with the chunk size, i.e. the
    dispatch-queue depth, bounded at k_hi/nchunks (deep async queues
    have wedged the tunnel).

    CRITICAL for fast ops: device execution overlaps the tunnel
    round-trips, so if the long leg's extra work fits inside the fences'
    ~50 ms latency windows the slope measures pure noise and 1/slope can
    report physically impossible rates (observed: a kernel "measuring"
    2.6 TB/s of HBM traffic).  The long leg is therefore grown until the
    measured delta t_hi - t_lo exceeds ``min_delta`` seconds — the slope
    is only trusted when the extra work dominates fence jitter.

    Returns the best (minimum) trusted slope over ``repeats`` trials;
    raises if no trustworthy positive slope was obtained.
    """
    assert k_lo % nchunks == 0 and k_hi % nchunks == 0 and k_hi > k_lo

    def leg(k):
        per = k // nchunks
        t0 = time.perf_counter()
        for _ in range(nchunks):
            for _ in range(per):
                step()
            fence()
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        t_lo = leg(k_lo)
        cur_hi = k_hi
        while True:
            t_hi = leg(cur_hi)
            if t_hi - t_lo >= min_delta or cur_hi >= max_ops:
                break
            # grow the long leg so extra work dominates fence round-trips
            grow = max(2, int(min_delta * 1.5 / max(t_hi - t_lo, 1e-3)))
            cur_hi = min(max_ops, ((cur_hi * grow) // nchunks) * nchunks)
        s = (t_hi - t_lo) / (cur_hi - k_lo)
        if s > 0 and (t_hi - t_lo) >= min_delta * 0.5:
            best = min(best, s)
    if best == float("inf"):
        raise RuntimeError(
            "no trustworthy slope: the delta never exceeded min_delta "
            "(op too fast / max_ops too small) or was non-positive")
    return best


def ops_per_s(step, fence, **kw) -> float:
    return 1.0 / slope_time(step, fence, **kw)
