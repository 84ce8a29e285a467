"""Auto-tuned decoder selection.

Picks the fastest known decoder configuration for a code on the current
backend, from the measured frontier in ``results/THROUGHPUT.md``:

* small/medium N — whole-code Pallas kernel in the SSA style
  (value-passing body, compiler-managed lifetimes — measured ~13%
  faster than the explicit scratch pyramid), frame tile from the sweep;
* large N (pyramid would exceed VMEM) — hybrid: XLA upper levels +
  subtree kernels at level 13 (tile 128 — the largest VMEM-feasible
  subtree; kl13 beat kl11/kl12 at every measured m=14..18, +5-14%);
* non-TPU backends (CPU tests, debugging) — the XLA path (Pallas
  compiles only in interpret mode there).

All variants are bit-exact; this is purely a performance choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..code.construction import PolarCode
from .fastssc import make_fastssc_decoder

# frame tiles by log2(N), from the measured sweeps (results/THROUGHPUT.md)
# (SSA style: no scratch pyramid, so larger tiles/sizes fit than under
# the scratch style — N=4096 t256 measured 11.4M vs t128's 10.0M, and
# whole-code N=8192 works at 4.6M where the scratch pyramid could not)
_TILE_BY_LEVEL = {6: 1024, 7: 1024, 8: 512, 9: 512, 10: 512, 11: 256,
                  12: 256, 13: 128, 14: 128, 15: 128, 16: 128}
# Mosaic's default 16M scoped-VMEM budget is far below the chip's
# physical VMEM (r3 vmemprobe/vmem2 receipts): whole-code SSA kernels
# now run to m=16 with raised budgets and BEAT the hybrid — m14 1.82M
# (vs 1.81M), m15 922K (vs 748K, +23%), m16 446K (vs 314K, +42%).
# First-call compiles grow with the kernel (m16: ~29 min through the
# relay; the persistent compile cache amortizes repeats).
_WHOLE_VMEM_BY_LEVEL = {14: 32, 15: 64, 16: 110}
# the cw track's extra value chain needs roughly the next level's
# budget (receipts m14-wholecode-cw-t128-v64, m15-wholecode-cw-v110)
_WHOLE_CW_VMEM_BY_LEVEL = {14: 64, 15: 110}
_HYBRID_MIN_LEVEL = 17       # whole-code m17 would need ~183M VMEM
# u-output hybrids run kl15 subtree kernels (level-15 whole-code bodies
# at a 64M budget): m17 147.6K vs kl13's 118.7K (+24%), m18 61.2K vs
# 54.3K (+13%) — receipts r3 klladder. The cw-track kl15 kernels fit a
# 110M budget and win the same way — m16 299.7K vs kl13's 240.5K
# (+24.6%, r3), and the former m17/m18 extrapolation is now DIRECTLY
# receipted: m17-cw 123.1K vs kl13's 95.4K (+29%) and the m18-cw pair
# (r4 receipts m17/m18-hybridcw-*) — so non-u hybrids run kl15 too.
_HYBRID_KL_U, _HYBRID_KL_U_VMEM = 15, 64
_HYBRID_KL_CW, _HYBRID_KL_CW_VMEM = 15, 110
_HYBRID_KERNEL_LEVEL = 13    # pre-kl15 champion (r2 ladder2 receipts)
_HYBRID_TILE = 128           # t256 at kl13 exceeds scoped VMEM (receipt)
# boundary f/g/comb fusion beat the UNFUSED kl13 where the XLA top is
# deep (m17 +4.2%), but kl15 beats both; fused kl15-cw is OFF BY
# RECEIPT — its kernel needs 112.9M scoped vs the ~110M effective
# ceiling, and r5's upward cap probes showed the reported need tracks
# the budget (cap-chasing: +2-4M over any cap), so no budget fits
# (receipts m16-hybridcw-kl15-fuse1-v110 + the r5 v116/v120 probes).
_HYBRID_FUSE_MIN_LEVEL = 16
_HYBRID_FUSE_VMEM_MB = 32


def make_auto_decoder(code: PolarCode, *, output: str = "u",
                      output_dtype=jnp.int8, backend: str | None = None):
    """Best-known decoder for ``code`` on ``backend`` (default: current).

    Returns ``(decode_fn, description)``. For Pallas variants the batch is
    padded internally; any batch size works.

    Contract: inputs are int8 (or integer-valued) LLRs — the kernels'
    integer-exact arithmetic (clip-based sign) requires it. For real-valued
    float LLRs use :func:`make_fastssc_decoder` (the float min-sum path).
    """
    if backend is None:
        backend = jax.default_backend()
    if backend not in ("tpu",):
        return (
            make_fastssc_decoder(code, output=output, output_dtype=output_dtype),
            "xla",
        )
    # cw-track whole-code kernels are receipted to m15 (m14-cw-v64
    # 1.534M, m15-cw-v110 751.9K fps — the m15 one beats the hybrid's
    # cw rate by ~11%); m16-cw would exceed the chip's VMEM
    whole_max = 16 if output == "u" else 15
    if code.level >= _HYBRID_MIN_LEVEL or (
            code.level >= 14 and code.level > whole_max):
        if output == "u":
            kl, vmem, fuse = _HYBRID_KL_U, _HYBRID_KL_U_VMEM, False
        else:
            kl, vmem, fuse = _HYBRID_KL_CW, _HYBRID_KL_CW_VMEM, False
        dec = make_fastssc_decoder(
            code, output=output, output_dtype=output_dtype,
            kernel_level=kl,
            kernel_frame_tile=_HYBRID_TILE,
            kernel_fuse=fuse,
            kernel_vmem_limit_mb=vmem,
        )
        return dec, (f"hybrid-kl{kl}-t{_HYBRID_TILE}"
                     + (f"-v{vmem}" if vmem else "")
                     + ("-fused" if fuse else ""))
    tile = _TILE_BY_LEVEL.get(code.level, 512 if code.level <= 10 else 128)
    vmem = (_WHOLE_VMEM_BY_LEVEL if output == "u"
            else _WHOLE_CW_VMEM_BY_LEVEL).get(code.level)
    from ..ops.pallas.decoder_kernel import make_pallas_decoder

    # non-"u" outputs use the kernel's fused codeword-estimate track (the
    # in-VMEM re-encode — no XLA re-encode epilogue, no extra HBM passes).
    dec = make_pallas_decoder(code, frame_tile=tile,
                              compute_dtype=jnp.float32,
                              output_dtype=output_dtype, style="ssa",
                              output=output, vmem_limit_mb=vmem)
    suffix = "" if output == "u" else "-fusedcw"
    if vmem:
        suffix += f"-v{vmem}"
    return dec, f"pallas-ssa-f32-t{tile}{suffix}"
