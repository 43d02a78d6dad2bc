from .datasets import RGBATrainDataset, KodakDataset
from .loader import BatchLoader
from .synthetic import synthetic_rgba_batch, write_synthetic_kodak_tree
