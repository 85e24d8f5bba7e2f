"""Host-side data layer (numpy/PIL; no torch).

Covers the reference's full dataset surface (SURVEY.md §2.5):
LUNA16 CT slices (pure-numpy NIfTI reader — nibabel-free), positive-patch
NPY volumes, generic image-folder datasets, CelebA-HQ/LSUN LMDB (gated on
the `lmdb` package), StackMNIST (pure-numpy IDX reader), CIFAR-10 pickle
batches, plus the yes/no-flag transform pipeline (ddgan.py:203-219) and a
sharded, prefetching loader that replaces DataLoader+DistributedSampler.
"""

from .nifti import read_nifti, write_nifti  # noqa: F401
from .transforms import build_transform, Compose  # noqa: F401
from .datasets import (  # noqa: F401
    Luna16Dataset,
    Luna16Dataset2,
    PositivePatchDataset,
    DatasetCustom,
    DataReader,
    HeavyDatasetCustom,
    save_slice_info,
    load_slice_info,
)
from .stackmnist import StackedMNIST  # noqa: F401
from .cifar10 import CIFAR10  # noqa: F401
from .lmdb_datasets import LMDBDataset, LSUN  # noqa: F401
from .loader import DataLoader, SyntheticDataset  # noqa: F401
from .factory import make_dataset  # noqa: F401
