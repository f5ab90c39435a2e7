"""Perf-regression band gate (straps_tpu/utils/bands.py + BENCH_BANDS.json).

VERDICT r4 weak #3: "a 20% regression in the raster kernel or the headline
would ship silently" — these tests pin the gate semantics (one-sided bands,
min for throughputs / max for latencies) and that the checked-in
BENCH_BANDS.json actually covers the recorded numbers CLAUDE.md lists.
"""

import json
import os

from straps_tpu.utils.bands import BANDS_PATH, check_band, load_bands


def test_bands_file_exists_and_covers_recorded_numbers():
    bands = load_bands()
    assert os.path.exists(BANDS_PATH)
    for name in ("headline_inf_per_s", "raster_ms_b140",
                 "train_step_ms_b140_bf16", "keypoint_rcnn_ms_per_img",
                 "pointrend_rcnn_ms_per_img", "densepose_rcnn_ms_per_img"):
        assert name in bands, name
        b = bands[name]
        assert b["direction"] in ("min", "max")
        assert 0 < b["rel_tol"] < 1
        assert b["value"] > 0


def test_min_band_fails_below_tolerance():
    bands = {"x": {"value": 100.0, "rel_tol": 0.2, "direction": "min"}}
    assert check_band("x", 100.0, bands, verbose=False)
    assert check_band("x", 81.0, bands, verbose=False)
    assert not check_band("x", 79.0, bands, verbose=False)
    # One-sided: faster never fails.
    assert check_band("x", 500.0, bands, verbose=False)


def test_max_band_fails_above_tolerance():
    bands = {"x": {"value": 100.0, "rel_tol": 0.2, "direction": "max"}}
    assert check_band("x", 100.0, bands, verbose=False)
    assert check_band("x", 119.0, bands, verbose=False)
    assert not check_band("x", 121.0, bands, verbose=False)
    # One-sided: faster (lower latency) never fails.
    assert check_band("x", 1.0, bands, verbose=False)


def test_unrecorded_band_passes():
    assert check_band("no_such_band", 1e9, {}, verbose=False)


def test_checked_in_bands_pass_on_recorded_values():
    # The recorded value itself must always be inside its own band.
    bands = load_bands()
    for name, b in bands.items():
        assert check_band(name, float(b["value"]), bands, verbose=False), name


def test_load_bands_missing_file(tmp_path):
    assert load_bands(str(tmp_path / "nope.json")) == {}


def test_load_bands_explicit_path(tmp_path):
    p = tmp_path / "bands.json"
    p.write_text(json.dumps({"y": {"value": 1.0, "rel_tol": 0.1,
                                   "direction": "min"}}))
    assert "y" in load_bands(str(p))
