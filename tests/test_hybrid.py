"""Hybrid decoder tests: Pallas subtree kernels inside the XLA recursion
(interpret mode on CPU); must be bit-exact with the plain XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.decode.fastssc import make_fastssc_decoder


def _llrs(code, batch, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(-128, 128, (batch, code.N)).astype(np.int8))


@pytest.mark.parametrize("style", ["ssa", "scratch"])
@pytest.mark.parametrize("m,klevel", [(7, 4), (8, 5), (9, 6)])
def test_hybrid_matches_xla(m, klevel, style):
    code = pt.make_code(m, rate=0.5)
    llr = _llrs(code, 128, m)
    ref = np.asarray(jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    hyb = np.asarray(
        jax.jit(
            make_fastssc_decoder(
                code, output_dtype=jnp.int8, kernel_level=klevel,
                kernel_frame_tile=128, kernel_interpret=True,
                kernel_style=style,
            )
        )(llr)
    )
    np.testing.assert_array_equal(hyb, ref)


@pytest.mark.parametrize("output", ["u", "systematic"])
@pytest.mark.parametrize("m,klevel", [(8, 5), (9, 6)])
def test_hybrid_fuse_matches_plain(m, klevel, output):
    """kernel_fuse=True (parent f/g/comb absorbed into kernel-eligible left
    children) must be bit-exact with the unfused hybrid and the XLA
    path — in BOTH layouts (the lane_major entry takes the fused
    kernels' 2x-row inputs too)."""
    code = pt.make_code(m, rate=0.5)
    llr = _llrs(code, 128, 1000 + m)
    ref = np.asarray(jax.jit(make_fastssc_decoder(
        code, output=output, output_dtype=jnp.int8))(llr))
    fused = make_fastssc_decoder(
        code, output=output, output_dtype=jnp.int8, kernel_level=klevel,
        kernel_frame_tile=128, kernel_interpret=True, kernel_fuse=True)
    np.testing.assert_array_equal(np.asarray(jax.jit(fused)(llr)), ref)
    lane = np.asarray(jax.jit(fused.lane_major)(llr.T))
    np.testing.assert_array_equal(lane.T, ref)


@pytest.mark.parametrize("output", ["u", "codeword"])
@pytest.mark.parametrize("cdt", [jnp.float32, jnp.bfloat16])
def test_hybrid_root_split_matches_xla(output, cdt):
    """kernel_level = m-1: the two-kernel whole-code split (the m17
    frontier config, sweep stage m17split) — the XLA top keeps only the
    root f/g/combine and the decode is two level-(m-1) kernel calls
    with one HBM hop. Must be bit-exact in both compute dtypes (bf16
    halves the kernel's VMEM; exact for integer values <= 256)."""
    m = 8
    code = pt.make_code(m, rate=0.5)
    llr = _llrs(code, 128, 77)
    ref = np.asarray(jax.jit(make_fastssc_decoder(
        code, output=output, output_dtype=jnp.int8))(llr))
    split = np.asarray(jax.jit(make_fastssc_decoder(
        code, output=output, output_dtype=jnp.int8, kernel_level=m - 1,
        kernel_frame_tile=128, kernel_compute_dtype=cdt,
        kernel_interpret=True))(llr))
    np.testing.assert_array_equal(split, ref)


def test_hybrid_systematic_output():
    code = pt.make_code(8, rate=0.5)
    llr = _llrs(code, 128, 42)
    ref = np.asarray(
        jax.jit(make_fastssc_decoder(code, output="systematic",
                                     output_dtype=jnp.int8))(llr)
    )
    hyb = np.asarray(
        jax.jit(
            make_fastssc_decoder(
                code, output="systematic", output_dtype=jnp.int8,
                kernel_level=5, kernel_frame_tile=128, kernel_interpret=True,
            )
        )(llr)
    )
    np.testing.assert_array_equal(hyb, ref)


@pytest.mark.parametrize("output", ["systematic", "codeword", "both"])
def test_hybrid_fused_cw_ties(output):
    """The hybrid's fused codeword track (subtree kernels emit cw blocks,
    XLA upper levels combine them) must equal the XLA re-encode path —
    zero-heavy LLRs force the tie zeros that distinguish the cw track
    from the internal hard track."""
    code = pt.make_code(9, rate=0.5)
    rng = np.random.default_rng(17)
    llr = jnp.asarray(np.concatenate([
        rng.integers(-2, 3, (64, code.N)),
        rng.integers(-128, 128, (64, code.N)),
    ]).astype(np.int8))
    ref = jax.jit(make_fastssc_decoder(code, output=output,
                                       output_dtype=jnp.int8))(llr)
    hyb = jax.jit(
        make_fastssc_decoder(
            code, output=output, output_dtype=jnp.int8, kernel_level=6,
            kernel_frame_tile=128, kernel_interpret=True,
        )
    )(llr)
    if output == "both":
        np.testing.assert_array_equal(np.asarray(hyb[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(hyb[1]), np.asarray(ref[1]))
    else:
        np.testing.assert_array_equal(np.asarray(hyb), np.asarray(ref))


def test_hybrid_scratch_style_systematic_still_works():
    """kernel_style="scratch" cannot emit the cw track — the decoder must
    fall back to the XLA re-encode, bit-exact as before."""
    code = pt.make_code(8, rate=0.5)
    llr = _llrs(code, 128, 23)
    ref = np.asarray(
        jax.jit(make_fastssc_decoder(code, output="systematic",
                                     output_dtype=jnp.int8))(llr)
    )
    hyb = np.asarray(
        jax.jit(
            make_fastssc_decoder(
                code, output="systematic", output_dtype=jnp.int8,
                kernel_level=5, kernel_frame_tile=128, kernel_interpret=True,
                kernel_style="scratch",
            )
        )(llr)
    )
    np.testing.assert_array_equal(hyb, ref)


def test_hybrid_autopads_ragged_batch():
    """VERDICT r1 #6: the hybrid (large-N champion) path must accept any
    batch size — batch=1000 at m=13 with tile 256 pads to 1024 internally
    and slices back. Noiseless round-trip: ±127 LLRs of a valid codeword
    decode to the message through the padded kernels."""
    code = pt.make_code(13, rate=0.5)
    rng = np.random.default_rng(7)
    msg = jnp.asarray((1 - 2 * rng.integers(0, 2, (1000, code.K))).astype(np.int8))
    cw = pt.encode(code, msg)
    llr = (cw.astype(jnp.int8) * jnp.int8(127)).astype(jnp.int8)
    dec = make_fastssc_decoder(
        code, output_dtype=jnp.int8, kernel_level=11,
        kernel_frame_tile=256, kernel_interpret=True,
    )
    out = np.asarray(jax.jit(dec)(llr))
    assert out.shape == (1000, code.K)
    np.testing.assert_array_equal(out, np.asarray(msg))


def test_hybrid_autopad_matches_xla_small():
    """Padding correctness vs the XLA path at a cheap size (batch 100,
    tile 128 → padded to 128)."""
    code = pt.make_code(9, rate=0.5)
    llr = _llrs(code, 100, 3)
    ref = np.asarray(jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    hyb = np.asarray(
        jax.jit(
            make_fastssc_decoder(
                code, output_dtype=jnp.int8, kernel_level=6,
                kernel_frame_tile=128, kernel_interpret=True,
            )
        )(llr)
    )
    np.testing.assert_array_equal(hyb, ref)


def test_hybrid_kernel_cache_shared():
    """Identical frozen subtrees must share one kernel instance."""
    from polar_tpu.code.compiler import compile_code

    code = pt.make_code(9, rate=0.5)
    calls = []
    dec = make_fastssc_decoder(
        code, output_dtype=jnp.int8, kernel_level=6, kernel_frame_tile=128,
        kernel_interpret=True,
    )
    # count distinct kernels by tracing once and inspecting the closure cache
    llr = _llrs(code, 128, 1)
    jax.jit(dec)(llr).block_until_ready()
    # reach into the closure to find the cache dict (the per-layout
    # subtree_kernel_for closures live in the kernel_for dict)
    cells = [c.cell_contents for c in dec.__closure__ or []]
    cands = []
    for c in cells:
        cands.append(c)
        if isinstance(c, dict):
            cands.extend(c.values())
    sizes = []
    for c in cands:
        if callable(c) and getattr(c, "__name__", "") == "subtree_kernel_for":
            inner = [x.cell_contents for x in c.__closure__ or []]
            sizes.extend(len(obj) for obj in inner if isinstance(obj, dict))
    # the traced (frame) layout's cache must be populated; the untraced
    # lane layout's cache may legitimately be empty
    assert sizes and max(sizes) >= 1


@pytest.mark.parametrize("output", ["u", "systematic", "codeword"])
def test_hybrid_lane_major_matches_frame_major(output):
    """The zero-transpose lane-major entry (element-major recursion +
    lane-layout subtree kernels) must be bit-identical to the frame-major
    hybrid path — tie-heavy LLRs included."""
    code = pt.make_code(9, rate=0.5)
    rng = np.random.default_rng(23)
    llr = jnp.asarray(np.concatenate([
        rng.integers(-2, 3, (64, code.N)),
        rng.integers(-128, 128, (64, code.N)),
    ]).astype(np.int8))
    dec = make_fastssc_decoder(
        code, output=output, output_dtype=jnp.int8, kernel_level=6,
        kernel_frame_tile=128, kernel_interpret=True,
    )
    ref = np.asarray(jax.jit(dec)(llr))
    lane = np.asarray(jax.jit(dec.lane_major)(llr.T)).T
    np.testing.assert_array_equal(lane, ref)


@pytest.mark.parametrize("output", ["u", "systematic", "codeword", "both"])
def test_xla_lane_major_matches_frame_major(output):
    """Pure-XLA lane-major path (axis=0 recursion, element-major
    re-encode fallback) vs the frame-major decoder."""
    code = pt.make_code(8, rate=0.5)
    llr = _llrs(code, 64, 7)
    dec = make_fastssc_decoder(code, output=output, output_dtype=jnp.int8)
    ref = jax.jit(dec)(llr)
    lane = jax.jit(dec.lane_major)(llr.T)
    if output == "both":
        for r, l in zip(ref, lane):
            np.testing.assert_array_equal(np.asarray(l).T, np.asarray(r))
    else:
        np.testing.assert_array_equal(np.asarray(lane).T, np.asarray(ref))


def test_hybrid_lane_major_pads_batch():
    """Lane-major batches not a multiple of the kernel frame tile are
    padded internally, mirroring the frame-major contract."""
    code = pt.make_code(9, rate=0.5)
    llr = _llrs(code, 100, 11)
    dec = make_fastssc_decoder(
        code, output="systematic", output_dtype=jnp.int8, kernel_level=6,
        kernel_frame_tile=128, kernel_interpret=True,
    )
    ref = np.asarray(jax.jit(dec)(llr))
    lane = np.asarray(jax.jit(dec.lane_major)(llr.T)).T
    assert lane.shape == ref.shape
    np.testing.assert_array_equal(lane, ref)
