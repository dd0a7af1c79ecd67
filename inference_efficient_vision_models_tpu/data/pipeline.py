"""Device-feeding batch pipeline.

The reference's per-stage ``DataLoader`` + per-image torchvision transforms
(`teacher_training/dataset.py:14-21`) become: a resident uint8 array on the
host, an index-shuffling iterator, and a single jittable ``normalize_images``
that runs fused on device as the first op of each train/eval step. Every
batch has a static shape: the final partial batch is padded and carries a
validity mask, so XLA compiles exactly one step executable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

# ImageNet normalization constants (reference `teacher_training/dataset.py:20`)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(batch_u8, dtype=jnp.float32):
    """uint8 NHWC → normalized float NHWC. Jittable; fuses into the step."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    x = (batch_u8.astype(jnp.float32) - mean) / std
    return x.astype(dtype)


class Batches:
    """Iterate (images_u8, labels, mask) in static-shape batches.

    ``mask`` is 1.0 for real samples, 0.0 for padding in the final batch.
    Shuffling is host-side numpy, reseeded per epoch for reproducibility.
    """

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
    ):
        assert len(images) == len(labels)
        self.images = images
        self.labels = np.asarray(labels, dtype=np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        return -(-len(self.labels) // self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.labels)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        n = len(self.labels)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            pad = bs - len(idx)
            mask = np.ones(bs, dtype=np.float32)
            if pad:
                mask[len(idx):] = 0.0
                if self.shuffle and n > 1:
                    # Training: pad with DISTINCT samples (wrap around the
                    # epoch's order) so train-mode BatchNorm statistics are
                    # computed over real images, not index-0 duplicates; the
                    # mask still zeroes their loss/accuracy contribution.
                    fill = np.resize(order[: max(n - len(idx), 1)], pad)
                else:
                    fill = np.zeros(pad, dtype=idx.dtype)
                idx = np.concatenate([idx, fill.astype(idx.dtype)])
            yield self.images[idx], self.labels[idx], mask
