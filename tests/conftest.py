"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests force the CPU backend (fast, deterministic, no TPU tunnel latency)
with 8 virtual devices so multi-chip sharding paths are exercised without
hardware — the TPU analog of the reference's QEMU cross-testing
(``/root/reference/Makefile:6-19``). Benchmarks (``bench.py``) run on the
real chip instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Two-lane suite: tests measured >= ~9 s on this host (r3 full-suite
# --durations receipt; together ~26 of the 29 suite minutes) are marked
# ``slow`` so ``pytest -m "not slow"`` is a < 5-minute smoke lane; CI /
# pre-merge runs everything. Names are function bases (parametrizations
# of a slow function are all slow — interpret-mode Pallas decodes
# dominate them regardless of the parameter).
_SLOW = {
    # oracle/golden parity (interpret-mode whole-decode sweeps)
    "test_decode_parity_int8", "test_encode_parity",
    "test_randomized_parity",
    # hybrid decoder (subtree kernels in interpret mode)
    "test_hybrid_autopads_ragged_batch", "test_hybrid_fused_cw_ties",
    "test_hybrid_lane_major_matches_frame_major",
    "test_hybrid_lane_major_pads_batch", "test_hybrid_autopad_matches_xla_small",
    "test_hybrid_matches_xla", "test_hybrid_systematic_output",
    "test_hybrid_fuse_matches_plain",
    "test_hybrid_kernel_cache_shared",
    "test_hybrid_scratch_style_systematic_still_works",
    # fused step / front kernels
    "test_block_front_step_matches_whole_front_step",
    "test_front_blocks_inject_matches_whole_front",
    "test_bits_step_statistics_track_xla_step",
    "test_inject_counters_match_xla_chain_exactly",
    "test_block_front_step_nonsys_counters_match_xla_chain",
    "test_nonsystematic_bits_mode_equals_inject",
    "test_bits_mode_equals_inject_of_derived_values",
    "test_decode_count_kernel_matches_xla_counter_math",
    "test_front_path_counters_match_reference_chain",
    "test_step_body_pallas_bits_statistics_track_threefry",
    # whole-code Pallas kernels
    "test_ssa_kernel_matches_scratch", "test_pallas_fused_output_modes",
    # element-sharded decode (8-device mesh, interpret kernels)
    "test_seqpar_decode_bitexact_vs_local",
    "test_seqpar_decode_batch_split_mode",
    "test_seqpar_decode_qfloat_compute",
    "test_seqpar_decode_rdma_bitexact_vs_local",
    "test_seqpar_decode_u_full_frozen_slots",
    # distributed / meters / misc heavy
    "test_measure_decode_fps_on_frame_mesh",
    "test_two_process_checkpoint_resume_broadcast",
    "test_two_process_campaign_agrees",
    "test_pallas_encoder_bit_exact",
    "test_decoder_batch_polymorphism", "test_noiseless_roundtrip_int8",
    "test_sc_equals_fastssc_float", "test_qfloat_bitexact_with_int8",
    "test_readme_quickstart",
    # second-pass stragglers (fast lane measured 7 min; these bring it
    # under 5)
    "test_inject_counters_match_xla_chain_nonsystematic",
    "test_step_systematic_matches_old_reencode_path",
    "test_seqpar_decode_small_meshes",
    "test_pallas_matches_xla_int8",
    "test_pallas_encoder_systematic_property",
    "test_decode_parity_vs_reference_random_llrs",
    "test_sharded_encoder_matches_local",
    "test_pallas_saturation_edges",
    "test_transform_axis0_matches_transpose",
    "test_pallas_decode_parity_on_vectors",
    "test_step_body_pallas_bits_falls_back_on_bad_shapes",
    "test_ring_shift_matches_roll",
    "test_campaign_with_qfloat_compute",
    "test_multihost_cli_main",
    "test_systematic_output_matches_reencode_gather",
    "test_xla_lane_major_matches_frame_major",
    "test_sharded_equals_sum_of_independent_shards",
    "test_front_blocks_nonsys_inject_exact",
    "test_sharded_point_reproducible",
    "test_codeword_output_is_reencoded_u",
    "test_interp_count_step_path_matches_default",
    "test_interp_subtree_level_invariance",
    "test_interp_hybrid_matches_ssa_hybrid",
    "test_interp_hybrid_lane_major",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW:
            item.add_marker(pytest.mark.slow)
