"""Datasets + synthetic corpora."""

from straps_tpu.data.dataset import SyntheticTrainingDataset, epoch_batches
from straps_tpu.data.fixtures import write_synthetic_corpus

__all__ = ["SyntheticTrainingDataset", "epoch_batches", "write_synthetic_corpus"]
