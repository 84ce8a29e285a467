"""Dtype-polymorphic decoder arithmetic (the TPU-native `PolarHelper`).

This module defines the small op vocabulary the polar encoder/decoder is
written in, for two numeric domains:

* **Saturating int8 fixed point** — bit-exact with the reference's SIMD
  int8 semantics (``/root/reference/polar_helper.hh:113-173``, the AVX2
  ``vsign``-based path), including the ``-127`` clamps that guard the
  asymmetric int8 range.
* **Floating point** (float32 / bfloat16) — matching the generic SIMD
  float semantics (``/root/reference/polar_helper.hh:63-111``).

All functions are elementwise over arbitrarily-shaped jnp arrays, so the
frame-batch dimension of the TPU build simply rides along (the analog of
the reference's SIMD lane dimension).

Semantics cheat sheet (int8):
  qadd(a, b)      = sat8(a + b)                 saturating add
  qabs(a)         = |max(a, -127)|              abs that cannot overflow
  prod(a, b)      = sign(a)*sign(b)*min(qabs(a), qabs(b))   min-sum "f"
  madd(a, b, c)   = sat8(sign(a)*max(b, -127) + c)          "g" update
  qmul(a, b)      = a * sign(b), 0 if b == 0    hard-value multiply
  signum(a)       = -1/0/+1
  decide(a)       = -1 if a < 0 else +1
  flip(a,b,c,d)   = qmul(a, b) where c == d else a
  quant(x)        = clamp(rint(x), -128, 127) -> int8
"""

from __future__ import annotations

import jax.numpy as jnp

_I8_MIN = -128
_I8_MAX = 127


def _is_int8(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)


def _sat8(x32):
    """Clamp a wider-integer value into int8 range and cast back."""
    return jnp.clip(x32, _I8_MIN, _I8_MAX).astype(jnp.int8)


def one(dtype):
    return jnp.asarray(1, dtype=dtype)


def zero(dtype):
    return jnp.asarray(0, dtype=dtype)


def signum(a):
    """-1 / 0 / +1 with the input's dtype (``polar_helper.hh:125-128``)."""
    return jnp.sign(a)


def decide(a):
    """Hard decision: +1 for a >= 0, -1 for a < 0.

    int8: ``polar_helper.hh:129-132`` (OR of 0x01 with the a<0 mask).
    float: ``copysign(1, a)`` (``polar_helper.hh:79-82``).
    """
    if _is_int8(a):
        return jnp.where(a < 0, jnp.asarray(-1, a.dtype), jnp.asarray(1, a.dtype))
    return jnp.copysign(jnp.asarray(1, a.dtype), a)


def qabs(a):
    """Saturating abs; int8 guards -128 (``polar_helper.hh:133-136``)."""
    if _is_int8(a):
        return jnp.abs(jnp.maximum(a, jnp.asarray(-127, a.dtype)))
    return jnp.abs(a)


def qmin(a, b):
    return jnp.minimum(a, b)


def qadd(a, b):
    """Saturating add for int8 (``polar_helper.hh:141-144``), plain add for float."""
    if _is_int8(a):
        return _sat8(a.astype(jnp.int16) + b.astype(jnp.int16))
    return a + b


def qmul(a, b):
    """Hard-decision multiply.

    Only ever applied to hard values in {-1, 0, +1}; the int8 reference
    uses ``vsign`` (``polar_helper.hh:145-152``) which equals plain
    multiplication on that domain.
    """
    return a * b


def prod(a, b):
    """Min-sum check-node op ("f"): sign(a)sign(b)min(|a|,|b|).

    int8 path mirrors ``polar_helper.hh:153-160`` (vsign chain over
    saturating abs); float path ``polar_helper.hh:99-102``.
    """
    s = jnp.sign(a) * jnp.sign(b)
    if _is_int8(a):
        m = jnp.minimum(qabs(a), qabs(b))
        return (s * m).astype(a.dtype)
    return s * jnp.minimum(jnp.abs(a), jnp.abs(b))


def madd(a, b, c):
    """Variable-node op ("g"): a*b + c with a a hard value.

    int8: ``sat8(sign(a) * max(b, -127) + c)`` — the ``vsign(vmax(b,-127),a)``
    + ``vqadd`` sequence of ``polar_helper.hh:161-168``.
    """
    if _is_int8(a):
        p = jnp.sign(a).astype(jnp.int16) * jnp.maximum(
            b, jnp.asarray(-127, b.dtype)
        ).astype(jnp.int16)
        return _sat8(p + c.astype(jnp.int16))
    return a * b + c


def flip(a, b, c, d):
    """Conditional sign flip: qmul(a, b) where c == d, else a.

    (``polar_helper.hh:169-172``; used by the SPC node's weakest-bit flip.)
    """
    return jnp.where(c == d, qmul(a, b), a)


def quant(x, dtype=jnp.int8):
    """LLR quantizer: round-to-nearest-even then clamp to [-128, 127].

    Matches scalar ``PolarHelper<int8_t>::quant`` (``polar_helper.hh:194-198``,
    ``std::nearbyint`` under the default rounding mode). For float dtypes it
    is the identity cast (``polar_helper.hh:28-32``).
    """
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        return jnp.clip(jnp.rint(x), _I8_MIN, _I8_MAX).astype(dtype)
    return x.astype(dtype)
