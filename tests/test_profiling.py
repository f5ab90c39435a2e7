import time

from straps_tpu.utils.profiling import StepTimer, trace
from straps_tpu.utils.model_utils import count_parameters


class TestStepTimer:
    def test_measure_and_summary(self):
        t = StepTimer()
        with t.measure("a"):
            time.sleep(0.01)
        with t.measure("a"):
            time.sleep(0.01)
        assert t.counts["a"] == 2
        assert 5 < t.mean_ms("a") < 100
        assert "a=" in t.summary()
        t.reset()
        assert t.mean_ms("a") == 0.0


class TestTrace:
    def test_noop_without_dir(self):
        with trace(None):
            pass  # must be a clean no-op


class TestCountParameters:
    def test_counts(self):
        import numpy as np
        tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
        assert count_parameters(tree) == 11
