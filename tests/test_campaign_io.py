"""Campaign persistence: JSON round-trip, checkpoint/resume, plotting."""

import json
import math

import numpy as np
import pytest

import polar_tpu as pt
from polar_tpu.campaign_io import (
    load_result,
    plot_waterfall,
    result_from_dict,
    result_to_dict,
    save_result,
)

CODE = pt.make_code(6, rate=0.5)


def _mini_campaign(tmp_path, **kw):
    return pt.run_campaign(
        CODE, batch=256, max_frames_per_point=512, target_bit_errors=100,
        snr_range=(3.0, 10.0), snr_step=1.0, stop_after_clean=2,
        measure_throughput=False, **kw,
    )


def test_result_roundtrip(tmp_path):
    res = _mini_campaign(tmp_path)
    d = result_to_dict(res)
    back = result_from_dict(json.loads(json.dumps(d)))
    assert back.code_n == res.code_n
    assert back.qef_snr_db == res.qef_snr_db
    assert len(back.points) == len(res.points)
    assert back.points[0].ber == res.points[0].ber


def test_checkpoint_written_and_resumed(tmp_path):
    path = tmp_path / "ckpt.json"
    res = _mini_campaign(tmp_path, checkpoint_path=path)
    saved = load_result(path)
    assert saved is not None
    assert len(saved.points) == len(res.points)

    # resume: same seed and settings → identical result, loaded not re-run
    res2 = _mini_campaign(tmp_path, checkpoint_path=path)
    assert [p.ber for p in res2.points] == [p.ber for p in res.points]
    assert res2.qef_snr_db == res.qef_snr_db


def test_partial_checkpoint_resume(tmp_path):
    """Truncate the checkpoint to 2 points; the resumed campaign must
    reproduce the full sweep exactly (points are key-pure)."""
    path = tmp_path / "ckpt.json"
    res = _mini_campaign(tmp_path, checkpoint_path=path)
    partial = load_result(path)
    partial.points = partial.points[:2]
    save_result(partial, path)
    res2 = _mini_campaign(tmp_path, checkpoint_path=path)
    assert [p.ber for p in res2.points] == [p.ber for p in res.points]


def test_load_missing_returns_none(tmp_path):
    assert load_result(tmp_path / "nope.json") is None


def test_plot_waterfall(tmp_path):
    res = _mini_campaign(tmp_path)
    out = tmp_path / "wf.png"
    plot_waterfall([res], out, title="test")
    assert out.stat().st_size > 1000
