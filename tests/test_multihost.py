"""Multi-host campaign runner smoke tests (single process, 8 CPU devices)."""

import polar_tpu as pt
from polar_tpu.parallel.multihost import (
    initialize_multihost,
    is_lead_host,
    run_multihost_campaign,
)


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False
    assert is_lead_host()


def test_run_multihost_campaign_small():
    code = pt.make_code(6, rate=0.5)
    points = run_multihost_campaign(
        code, per_device_batch=32, max_global_frames=512,
        target_bit_errors=50, snr_range=(4.0, 10.0), snr_step=1.0,
        stop_after_clean=2, verbose=False,
    )
    assert len(points) >= 2
    assert points[-1]["bit_errors"] == 0
    assert points[0]["frames"] % (32 * 8) == 0
