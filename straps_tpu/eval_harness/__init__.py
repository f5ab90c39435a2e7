"""Offline evaluation harness."""

from straps_tpu.eval_harness.datasets import (
    load_eval_dataset, load_ssp3d, load_3dpw,
)
from straps_tpu.eval_harness.runner import (
    load_eval_npz, run_evaluation, synthesise_proxy_inputs,
)

__all__ = ["load_eval_npz", "load_eval_dataset", "run_evaluation",
           "synthesise_proxy_inputs", "load_ssp3d", "load_3dpw"]
