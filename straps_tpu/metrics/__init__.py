"""Metric math (on-device) + trackers (host-side)."""

from straps_tpu.metrics.compute import compute_per_frame_metrics, ALL_METRICS
from straps_tpu.metrics.tracker import TrainingTracker
from straps_tpu.metrics.eval_tracker import EvalMetricsTracker

__all__ = ["compute_per_frame_metrics", "ALL_METRICS", "TrainingTracker",
           "EvalMetricsTracker"]
