"""Code persistence and decoder-cache tests."""

import numpy as np
import pytest

import polar_tpu as pt
from polar_tpu.code.store import DecoderCache, load_code, save_code


def test_save_load_roundtrip(tmp_path):
    code = pt.make_code(8, rate=0.5)
    p = tmp_path / "code.npz"
    save_code(code, p)
    back = load_code(p)
    assert back == code
    assert back.K == code.K


def test_load_detects_corruption(tmp_path):
    code = pt.make_code(6, rate=0.5)
    p = tmp_path / "code.npz"
    save_code(code, p)
    import numpy as np

    with np.load(p) as z:
        data = dict(z)
    data["frozen"] = 1 - data["frozen"]  # flip mask, keep stale program
    np.savez_compressed(p, **data)
    # either the program/mask integrity check or the compiler's own
    # validation fires — both reject the corrupt file
    with pytest.raises(ValueError):
        load_code(p)


def test_decoder_cache_identity():
    cache = DecoderCache()
    a = pt.make_code(6, rate=0.5)
    b = pt.make_code(6, rate=0.5)  # equal spec → same cache slot
    d1 = cache.get(a, output="u")
    d2 = cache.get(b, output="u")
    d3 = cache.get(a, output="systematic")
    assert d1 is d2
    assert d1 is not d3
    assert len(cache) == 2


def test_cached_decoder_works(tmp_path):
    import jax
    import jax.numpy as jnp

    cache = DecoderCache()
    code = pt.make_code(5, rate=0.5)
    dec = jax.jit(cache.get(code))
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.integers(-128, 128, (8, code.N)).astype(np.int8))
    assert dec(llr).shape == (8, code.K)
