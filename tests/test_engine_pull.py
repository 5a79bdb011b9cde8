"""Unit tests for the structured pull pass primitives (engine_pull).

The strided read/accumulate pair must match brute-force gather/scatter for
every pattern regime (T > P, T == P, T < P overlapping, T == 0 broadcast,
negative base, out-of-range trimming), and fit/decompose must recover the
maps real model builders produce — including the single-chunk grid build
that interleaves H/V edge sheets in one slot."""
import numpy as np
import jax.numpy as jnp
import pytest

from lp_mp_tpu.engine_pull import (Strided, decompose, fit_pattern,
                                   strided_accumulate, strided_read)


def brute_read(src, pat, n_lanes):
    b, T, P = pat.b, pat.T, pat.P
    out = np.zeros((n_lanes,) + src.shape[1:], src.dtype)
    for u in range(n_lanes):
        r = b + (u // P) * T + (u % P)
        if 0 <= r < src.shape[0]:
            out[u] = src[r]
    return out


def brute_acc(contrib, pat, n_rows):
    b, T, P = pat.b, pat.T, pat.P
    out = np.zeros((n_rows,) + contrib.shape[1:], contrib.dtype)
    for u in range(contrib.shape[0]):
        r = b + (u // P) * T + (u % P)
        if 0 <= r < n_rows:
            out[r] += contrib[u]
    return out


PATTERNS = [
    Strided(0, 100, 100),      # identity blocks
    Strided(7, 100, 100),      # constant offset
    Strided(-3, 100, 100),     # negative base
    Strided(0, 100, 99),       # T > P (grid send)
    Strided(-1, 99, 100),      # T < P overlapping (grid recv)
    Strided(5, 40, 100),       # T << P, K = 3 sub-reads
    Strided(2, 0, 37),         # broadcast
    Strided(950, 100, 100),    # reads past the end (trim)
]


@pytest.mark.parametrize("pat", PATTERNS)
@pytest.mark.parametrize("tail", [(), (4,)])
def test_strided_read_matches_bruteforce(pat, tail):
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1000,) + tail)
    for n_lanes in (1, 50, 997, 1003):
        got = np.asarray(strided_read(jnp.asarray(src), pat, n_lanes))
        want = brute_read(src, pat, n_lanes)
        # lanes whose pattern row is out of range carry garbage by contract;
        # compare only in-range lanes
        u = np.arange(n_lanes)
        r = pat.b + (u // pat.P) * pat.T + (u % pat.P)
        ok = (r >= 0) & (r < src.shape[0])
        assert np.array_equal(got[ok], want[ok]), (pat, n_lanes)


@pytest.mark.parametrize("pat", PATTERNS)
@pytest.mark.parametrize("tail", [(), (3,)])
def test_strided_accumulate_matches_bruteforce(pat, tail):
    rng = np.random.default_rng(1)
    for n_lanes in (1, 64, 997):
        contrib = rng.normal(size=(n_lanes,) + tail)
        # zero lanes whose target row is out of range (caller contract)
        u = np.arange(n_lanes)
        r = pat.b + (u // pat.P) * pat.T + (u % pat.P)
        contrib[(r < 0) | (r >= 800)] = 0.0
        got = np.asarray(strided_accumulate(jnp.asarray(contrib), pat, 800))
        want = brute_acc(contrib, pat, 800)
        assert np.allclose(got, want, atol=1e-12), (pat, n_lanes)


def test_fit_pattern_regimes():
    u = np.arange(1000)
    for pat in PATTERNS[:6]:
        f = pat.b + (u // pat.P) * pat.T + (u % pat.P)
        valid = f >= 0
        got = fit_pattern(f * valid, valid)
        assert got is not None
        assert np.array_equal(
            got.b + (u[valid] // got.P) * got.T + (u[valid] % got.P),
            f[valid]), (pat, got)


def test_fit_pattern_irregular_returns_none():
    rng = np.random.default_rng(2)
    f = rng.integers(0, 1000, size=500)
    valid = np.ones(500, dtype=bool)
    assert fit_pattern(f, valid) is None


def test_decompose_mixed_grid_sheets():
    """Single-chunk grid build: slot 0 of the unary-side recv op holds the
    H-edge sheet on most lanes and the V-edge sheet on the last column.
    decompose must explain every lane with strided sheets (no fallback)."""
    H = W = 50
    EH = H * (W - 1)
    f = np.zeros(H * W, dtype=np.int64)
    valid = np.zeros(H * W, dtype=bool)
    for r in range(H):
        for c in range(W):
            u = r * W + c
            if c < W - 1:                  # H edge (r, c)-(r, c+1)
                f[u] = r * (W - 1) + c
                valid[u] = True
            elif r < H - 1:                # V edge fills the rank-0 slot
                f[u] = EH + r * W + c
                valid[u] = True
    sheets = decompose(f, valid, row_cap=10 * H * W)
    assert all(pat is not None for pat, _ in sheets), sheets
    covered = np.zeros(H * W, dtype=bool)
    for pat, m in sheets:
        u = np.nonzero(m)[0]
        assert np.array_equal(
            pat.b + (u // pat.P) * pat.T + (u % pat.P), f[u])
        assert not (covered & m).any()
        covered |= m
    assert np.array_equal(covered, valid)


def test_decompose_random_falls_back():
    rng = np.random.default_rng(3)
    f = rng.integers(0, 5000, size=2000)
    valid = np.ones(2000, dtype=bool)
    sheets = decompose(f, valid, row_cap=50000)
    covered = np.zeros(2000, dtype=bool)
    for pat, m in sheets:
        covered |= m
    assert covered.all()
    assert any(pat is None for pat, m in sheets)  # gather sheet remains
