from witw_tpu.data.csv_registry import read_pair_paths
from witw_tpu.data.loader import PairLoader, split_train_val
from witw_tpu.data.synthetic import SyntheticPairs, write_synthetic_dataset

__all__ = [
    "read_pair_paths",
    "PairLoader",
    "split_train_val",
    "SyntheticPairs",
    "write_synthetic_dataset",
]
