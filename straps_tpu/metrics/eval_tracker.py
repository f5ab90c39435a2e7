"""Offline-evaluation tracker (SSP-3D / 3DPW harness).

Equivalent of `metrics/eval_metrics_tracker.py`: per-batch accumulation of
the same metric families plus dataset-level silhouette IoU from TP/FP/FN
counts (`eval_metrics_tracker.py:158-191`) and optional per-frame npy dumps
(`eval_metrics_tracker.py:207-210`).
"""

import os
from typing import Dict, Optional

import numpy as np


class EvalMetricsTracker:
    def __init__(self, metrics_to_track, img_wh: Optional[int] = None,
                 save_path: Optional[str] = None,
                 save_per_frame_metrics: bool = False):
        self.metrics_to_track = list(metrics_to_track)
        self.img_wh = img_wh
        self.save_path = save_path
        self.save_per_frame_metrics = save_per_frame_metrics
        self.initialise()

    def initialise(self):
        self.total_samples = 0
        self.metric_sums: Dict[str, float] = {}
        self.per_frame: Dict[str, list] = {m: [] for m in self.metrics_to_track}
        for m in self.metrics_to_track:
            if m == "silhouette_ious":
                for k in ("tp", "fp", "fn", "tn"):
                    self.metric_sums[f"silhouette_{k}"] = 0.0
            else:
                self.metric_sums[m] = 0.0

    def update_per_batch(self, per_frame_metrics: Dict[str, np.ndarray],
                         num_inputs: int):
        """`per_frame_metrics` from `compute_per_frame_metrics` (numpy'd)."""
        self.total_samples += num_inputs
        for m in self.metrics_to_track:
            vals = np.asarray(per_frame_metrics[m])
            self.per_frame[m].append(vals)
            if m == "silhouette_ious":
                for k in ("tp", "fp", "fn", "tn"):
                    self.metric_sums[f"silhouette_{k}"] += float(
                        np.sum(per_frame_metrics[f"silhouette_{k}"]))
            else:
                self.metric_sums[m] += float(np.sum(vals))

    def compute_final_metrics(self) -> Dict[str, float]:
        final = {}
        for m in self.metrics_to_track:
            if m == "silhouette_ious":
                tp = self.metric_sums["silhouette_tp"]
                fp = self.metric_sums["silhouette_fp"]
                fn = self.metric_sums["silhouette_fn"]
                final[m] = tp / max(tp + fp + fn, 1.0)
            else:
                final[m] = self.metric_sums[m] / max(self.total_samples, 1)
        if self.save_per_frame_metrics and self.save_path is not None:
            os.makedirs(self.save_path, exist_ok=True)
            for m in self.metrics_to_track:
                arr = np.concatenate(self.per_frame[m], axis=0)
                np.save(os.path.join(self.save_path, f"{m}_per_frame.npy"), arr)
        return final
