"""Intra-frame (element-axis) sharded transform tests on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.parallel.seqpar import (
    element_mesh,
    make_sharded_encoder,
    make_sharded_transform,
)


def rand_pm1(rng, shape):
    return (1 - 2 * rng.integers(0, 2, shape)).astype(np.int8)


@pytest.mark.parametrize("m", [5, 8, 11])
def test_sharded_transform_matches_local(m):
    mesh = element_mesh()
    rng = np.random.default_rng(m)
    x = rand_pm1(rng, (4, 1 << m))
    ref = np.asarray(pt.polar_transform(jnp.asarray(x)))
    got = np.asarray(jax.jit(make_sharded_transform(mesh))(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_sharded_transform_1d():
    mesh = element_mesh()
    rng = np.random.default_rng(0)
    x = rand_pm1(rng, (64,))
    ref = np.asarray(pt.polar_transform(jnp.asarray(x)))
    got = np.asarray(jax.jit(make_sharded_transform(mesh))(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("systematic", [False, True])
def test_sharded_encoder_matches_local(systematic):
    mesh = element_mesh()
    code = pt.make_code(9, rate=0.5)
    rng = np.random.default_rng(1)
    msg = rand_pm1(rng, (8, code.K))
    f = pt.encode_systematic if systematic else pt.encode
    ref = np.asarray(f(code, jnp.asarray(msg)))
    enc = jax.jit(make_sharded_encoder(code, mesh, systematic=systematic))
    got = np.asarray(enc(jnp.asarray(msg)))
    np.testing.assert_array_equal(got, ref)


def test_sharded_encoder_systematic_property():
    mesh = element_mesh()
    code = pt.make_code(10, rate=0.5)
    rng = np.random.default_rng(2)
    msg = rand_pm1(rng, (4, code.K))
    enc = jax.jit(make_sharded_encoder(code, mesh, systematic=True))
    cw = np.asarray(enc(jnp.asarray(msg)))
    np.testing.assert_array_equal(cw[:, code.info_indices], msg)


def test_rejects_indivisible_n():
    mesh = element_mesh()
    code = pt.make_code(2, rate=0.5)  # N=4 < 8 shards
    with pytest.raises(ValueError):
        make_sharded_encoder(code, mesh)
