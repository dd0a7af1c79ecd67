from .splits import create_fold_split_idx
from .neudet import build_img_paths, load_dataset
from .synthetic import make_synthetic_neudet
from .pipeline import Batches, normalize_images, IMAGENET_MEAN, IMAGENET_STD

__all__ = [
    "create_fold_split_idx",
    "build_img_paths",
    "load_dataset",
    "make_synthetic_neudet",
    "Batches",
    "normalize_images",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]
