from m4depth_tpu.data.datasets import get_adapter, DatasetAdapter
from m4depth_tpu.data.pipeline import SequenceDataset

__all__ = ["get_adapter", "DatasetAdapter", "SequenceDataset"]
