"""Min-convolution ops vs naive oracles (reference test/min_conv.cpp)."""
import numpy as np
import pytest
import jax.numpy as jnp

from lp_mp_tpu.factors.counting import min_corr
from lp_mp_tpu.ops.minconv import arg_min_conv, min_conv


def naive_min_conv(a, b, out_size):
    out = np.full(out_size, np.inf)
    for i in range(len(a)):
        for j in range(len(b)):
            if i + j < out_size:
                out[i + j] = min(out[i + j], a[i] + b[j])
    return out


def test_artificial_input():
    # test/min_conv.cpp:27-41
    a = np.array([0.1, 0.2, 0.05, 1.0])
    b = a[::-1].copy()
    got = np.asarray(min_conv(jnp.asarray(a), jnp.asarray(b), 7))
    np.testing.assert_allclose(got, naive_min_conv(a, b, 7))


@pytest.mark.parametrize("seed", range(5))
def test_random_parity(seed):
    rng = np.random.default_rng(seed)
    n, m = rng.integers(1, 12, size=2)
    a = rng.normal(size=n)
    b = rng.normal(size=m)
    S = int(rng.integers(1, n + m + 2))
    got = np.asarray(min_conv(jnp.asarray(a), jnp.asarray(b), S))
    np.testing.assert_allclose(got, naive_min_conv(a, b, S), rtol=1e-12)


def test_argmin_consistent():
    rng = np.random.default_rng(7)
    a, b = rng.normal(size=6), rng.normal(size=4)
    vals, arg = arg_min_conv(jnp.asarray(a), jnp.asarray(b), 9)
    vals, arg = np.asarray(vals), np.asarray(arg)
    for s in range(9):
        if np.isfinite(vals[s]):
            i = arg[s]
            assert 0 <= s - i < len(b)
            assert vals[s] == pytest.approx(a[i] + b[s - i])


def test_batched():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 5))
    b = rng.normal(size=(4, 3))
    got = np.asarray(min_conv(jnp.asarray(a), jnp.asarray(b), 7))
    for f in range(4):
        np.testing.assert_allclose(got[f], naive_min_conv(a[f], b[f], 7))


def test_min_corr():
    rng = np.random.default_rng(5)
    b = rng.normal(size=8)   # indexed by s+l
    lam = rng.normal(size=3)
    got = np.asarray(min_corr(jnp.asarray(b), jnp.asarray(lam), 8))
    want = np.full(8, np.inf)
    for s in range(8):
        for l in range(3):
            if s + l < 8:
                want[s] = min(want[s], lam[l] + b[s + l])
    np.testing.assert_allclose(got, want)
