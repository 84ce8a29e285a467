"""Persist constructed codes and memoize specialized decoders.

SURVEY.md §5 (checkpoint/resume): "persist frozen-bit sets / compiled
node programs as arrays to avoid recompiles". Construction is cheap but
deterministic artifacts matter for production serving: a saved code file
pins the exact frozen set (independent of library-version ranking
changes), and the in-process decoder cache gives one specialized
executable per (code, options) — the run-time analog of the reference
compiling its program once (``testbench.cc:95-97``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .compiler import compile_program
from .construction import PolarCode

_FORMAT_VERSION = 1


def save_code(code: PolarCode, path) -> None:
    """Write the code spec (+ its Fast-SSC byte program) to an .npz."""
    np.savez_compressed(
        path,
        version=np.int64(_FORMAT_VERSION),
        level=np.int64(code.level),
        frozen=np.asarray(code.frozen, dtype=np.uint8),
        program=compile_program(code),
    )


def load_code(path) -> PolarCode:
    with np.load(path) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unsupported code file version {int(z['version'])}")
        code = PolarCode(int(z["level"]), z["frozen"])
        # integrity: stored program must match the mask it ships with
        if not np.array_equal(z["program"], compile_program(code)):
            raise ValueError(f"corrupt code file {path}: program/mask mismatch")
    return code


class DecoderCache:
    """Memoize built decoders per (code, option) key.

    ``get(code, **opts)`` returns the same callable for identical
    arguments, so jit caches (keyed on function identity) are reused and
    each code/config compiles exactly once per process.
    """

    def __init__(self, builder=None):
        if builder is None:
            from ..decode.fastssc import make_fastssc_decoder

            builder = make_fastssc_decoder
        self._builder = builder
        self._cache: dict = {}

    def get(self, code: PolarCode, **opts):
        key = (code, tuple(sorted((k, repr(v)) for k, v in opts.items())))
        if key not in self._cache:
            self._cache[key] = self._builder(code, **opts)
        return self._cache[key]

    def __len__(self):
        return len(self._cache)


decoders = DecoderCache()
