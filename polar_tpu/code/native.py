"""Native (C) construction/compilation with transparent numpy fallback.

The hot TPU path never touches this module — construction and program
compilation are host-side, per-code, amortized work (the reference runs
them once per code too: ``testbench.cc:82-97``). The C extension
(``csrc/polar_native.c``) makes them fast for very large N (2^20+) and is
the framework's native-runtime component; when it isn't built, the numpy
implementations in :mod:`polar_tpu.code.construction` /
:mod:`polar_tpu.code.compiler` take over. Programs are byte-identical;
construction uses the same formulas and branch points in both
implementations and agrees to transcendental-library rounding (last-ulp
exp/log1p differences between numpy's SIMD kernels and glibc) — frozen
masks are verified equal at every tested design point including extreme
tails (tests/test_native.py).

Build with: ``python csrc/setup.py build_ext --inplace``.
"""

from __future__ import annotations

import math

import numpy as np

try:  # pragma: no cover - exercised only when the extension is built
    import _polar_native as _native
except ImportError:
    _native = None


def have_native() -> bool:
    return _native is not None


def bhattacharyya_logpe(level: int, erasure_probability: float = math.exp(-1.0)):
    if _native is None:
        from .construction import bhattacharyya_logpe as np_impl

        return np_impl(level, erasure_probability)
    raw = _native.bhatt_logpe(level, float(erasure_probability))
    return np.frombuffer(raw, dtype=np.float64)


def bhattacharyya_dual(level: int, erasure_probability: float = math.exp(-1.0)):
    """(log pe, log(1-pe)) arrays — native twin of
    :func:`polar_tpu.code.construction.bhattacharyya_dual`. The C evolution
    uses the identical update formulas and branch point; results agree with
    numpy to transcendental-library rounding in each domain's authoritative
    zone (see tests/test_native.py)."""
    if _native is None:
        from .construction import bhattacharyya_dual as np_impl

        return np_impl(level, erasure_probability)
    raw = _native.bhatt_dual(level, float(erasure_probability))
    both = np.frombuffer(raw, dtype=np.float64)
    n = 1 << level
    return both[:n], both[n:]


def frozen_mask_fixed_k(level: int, K: int, erasure_probability: float = math.exp(-1.0)):
    if _native is None:
        from .construction import frozen_mask_fixed_k as np_impl

        return np_impl(level, K, erasure_probability)
    raw = _native.frozen_fixed_k(level, int(K), float(erasure_probability))
    return np.frombuffer(raw, dtype=np.uint8).copy()


def frozen_mask_threshold(level: int, erasure_probability: float = 0.5,
                          freezing_threshold: float = 0.5):
    if _native is None:
        from .construction import frozen_mask_threshold as np_impl

        return np_impl(level, erasure_probability, freezing_threshold)
    raw = _native.frozen_threshold(level, float(erasure_probability),
                                   float(freezing_threshold))
    return np.frombuffer(raw, dtype=np.uint8).copy()


def compile_program(frozen: np.ndarray, level: int) -> np.ndarray:
    if _native is None:
        from .compiler import build_tree, emit_program

        return emit_program(build_tree(frozen, level), level)
    raw = _native.compile_program(
        np.ascontiguousarray(frozen, dtype=np.uint8).tobytes(), int(level)
    )
    return np.frombuffer(raw, dtype=np.uint8).copy()
