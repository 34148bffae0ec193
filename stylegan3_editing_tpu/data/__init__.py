"""Host-side data pipeline (numpy/PIL): datasets, transforms, batching."""

from .transforms import encode_transforms
from .images_dataset import ImagesDataset, BatchIterator, make_dataset

__all__ = ["encode_transforms", "ImagesDataset", "BatchIterator", "make_dataset"]
