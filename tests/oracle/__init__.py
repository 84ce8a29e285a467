"""Python driver for the reference-based golden oracle (test-only).

Builds ``oracle.cc`` against the read-only reference headers at
``/root/reference`` and exposes typed wrappers over its stdin/stdout
binary protocol. Lane-batched arrays are exchanged in the reference's
interleaved lane-major layout: a numpy array of shape ``(N, W)`` in C
order maps element i / frame k to ``buf[W*i + k]``.
"""

from __future__ import annotations

import shutil
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_REFERENCE = Path("/root/reference")
_BUILD = _HERE / "build"


def have_reference() -> bool:
    """True when the read-only reference checkout is mounted (oracle-backed
    parity tests skip otherwise; the frozen golden-vector suite in
    tests/test_golden_vectors.py still runs)."""
    return (_REFERENCE / "polar_decoder.hh").exists()


@lru_cache(maxsize=1)
def oracle_path() -> Path:
    """Compile the oracle once per source change; return the binary path."""
    _BUILD.mkdir(exist_ok=True)
    src = _HERE / "oracle.cc"
    binary = _BUILD / "oracle"
    stamp = _BUILD / "oracle.stamp"
    key = f"{src.stat().st_mtime_ns}"
    if binary.exists() and stamp.exists() and stamp.read_text() == key:
        return binary
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        raise RuntimeError("no C++ compiler for oracle")
    subprocess.run(
        [
            cxx, "-std=c++17", "-O2", "-march=native",
            "-I", str(_REFERENCE),
            str(src), "-o", str(binary),
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    stamp.write_text(key)
    return binary


def _run(args: list[str], payload: bytes = b"") -> bytes:
    out = subprocess.run(
        [str(oracle_path()), *args],
        input=payload,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        check=True,
    )
    return out.stdout


@lru_cache(maxsize=1)
def width() -> int:
    return int(_run(["width"]).decode().strip())


def freezek(m: int, k: int, pe: float) -> np.ndarray:
    data = _run(["freezek", str(m), str(k), repr(pe)])
    return np.frombuffer(data, dtype=np.uint8)


def freezeth(m: int, pe: float, th: float) -> np.ndarray:
    data = _run(["freezeth", str(m), repr(pe), repr(th)])
    return np.frombuffer(data, dtype=np.uint8)


def progcompile(m: int, frozen: np.ndarray) -> np.ndarray:
    data = _run(["progcompile", str(m)], frozen.astype(np.uint8).tobytes())
    return np.frombuffer(data, dtype=np.uint8)


def encode(m: int, frozen: np.ndarray, message_bk: np.ndarray,
           systematic: bool) -> np.ndarray:
    """message_bk: (B, K) int8 with B == width(). Returns (B, N) int8."""
    w = width()
    b, k = message_bk.shape
    assert b == w, f"oracle needs exactly {w} frames, got {b}"
    lane_major = np.ascontiguousarray(message_bk.T.astype(np.int8))  # (K, W)
    data = _run(
        ["encode", str(m), "1" if systematic else "0"],
        frozen.astype(np.uint8).tobytes() + lane_major.tobytes(),
    )
    n = 1 << m
    return np.frombuffer(data, dtype=np.int8).reshape(n, w).T.copy()


def decode(m: int, frozen: np.ndarray, llr_bn: np.ndarray) -> np.ndarray:
    """llr_bn: (B, N) int8 with B == width(). Returns (B, K) int8."""
    w = width()
    b, n = llr_bn.shape
    assert b == w and n == (1 << m)
    lane_major = np.ascontiguousarray(llr_bn.T.astype(np.int8))  # (N, W)
    data = _run(
        ["decode", str(m)],
        frozen.astype(np.uint8).tobytes() + lane_major.tobytes(),
    )
    k = int((frozen == 0).sum())
    return np.frombuffer(data, dtype=np.int8).reshape(k, w).T.copy()


@lru_cache(maxsize=1)
def widthf() -> int:
    return int(_run(["widthf"]).decode().strip())


def decode_float(m: int, frozen: np.ndarray, llr_bn: np.ndarray) -> np.ndarray:
    """Float-path decode (the testbench's ``typedef float code_type``
    ablation): llr_bn (B, N) float32 with B == widthf(). Returns (B, K)
    float32 hard-ish decisions as the reference decoder emits them."""
    w = widthf()
    b, n = llr_bn.shape
    assert b == w and n == (1 << m)
    lane_major = np.ascontiguousarray(llr_bn.T.astype(np.float32))  # (N, W)
    data = _run(
        ["decodef", str(m)],
        frozen.astype(np.uint8).tobytes() + lane_major.tobytes(),
    )
    k = int((frozen == 0).sum())
    return np.frombuffer(data, dtype=np.float32).reshape(k, w).T.copy()
