"""Data pipeline exports. Parity: /root/reference/src/dataset/__init__.py."""

from setok_tpu.data.collator import Collator
from setok_tpu.data.datasets import (EditingDataset, InstructionTuningDataset,
                                     LazySupervisedDataset,
                                     TextImagePairDataset)
from setok_tpu.data.sampler import LengthGroupedSampler

# The reference exports the collator under this name
# (src/dataset/__init__.py:1-4)
DataCollatorForSupervisedDataset = Collator

__all__ = ["Collator", "DataCollatorForSupervisedDataset", "EditingDataset",
           "InstructionTuningDataset", "LazySupervisedDataset",
           "TextImagePairDataset", "LengthGroupedSampler"]
