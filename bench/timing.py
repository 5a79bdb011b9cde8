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
               repeats: int = 2):
    """Per-op seconds of ``step()`` by two-point slope with true fences.

    Both legs issue exactly ``nchunks`` fences (so the fixed per-fence
    round-trip cancels in the slope) with the chunk size, i.e. the
    dispatch-queue depth, bounded at k_hi/nchunks (deep async queues
    have wedged the tunnel).  Returns the best (minimum) slope over
    ``repeats`` trials; raises if the slope is non-positive (i.e. the
    runtime lied about completion).
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
        t_hi = leg(k_hi)
        s = (t_hi - t_lo) / (k_hi - k_lo)
        if s > 0:
            best = min(best, s)
    if best == float("inf"):
        raise RuntimeError(
            "non-positive slope: runtime reported completion it cannot "
            "have performed; increase k_hi or suspect the fence")
    return best


def ops_per_s(step, fence, **kw) -> float:
    return 1.0 / slope_time(step, fence, **kw)
