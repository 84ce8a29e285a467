"""Cost-model tests."""

import polar_tpu as pt
from polar_tpu.utils.cost import decode_cost, kernel_vmem_bytes, max_frame_tile


def test_decode_cost_profile():
    c = decode_cost(pt.make_code(10, rate=0.5))
    assert c.n == 1024
    assert c.node_count > 50
    assert c.elem_ops_per_frame > 10000
    # f and g dominate (SURVEY-consistent)
    assert c.by_kind["f"][0] > c.by_kind["transform"][0]
    assert "f" in c.summary()


def test_max_frame_tile_bounds():
    # measured-working configs must fit the model's budget
    assert max_frame_tile(1024) >= 512
    assert max_frame_tile(4096) >= 128
    # N=16384 whole-code kernel cannot fit: hybrid territory
    assert max_frame_tile(16384) == 0


def test_vmem_monotonic():
    assert kernel_vmem_bytes(1024, 512) > kernel_vmem_bytes(1024, 256)
    assert kernel_vmem_bytes(2048, 256) > kernel_vmem_bytes(1024, 256)
