"""File-backed NEU-DET data path: directory scan contract + native decode."""

import os

import numpy as np

from inference_efficient_vision_models_tpu.core import TeacherConfig
from inference_efficient_vision_models_tpu.data import build_img_paths, load_dataset


def _make_neudet_tree(root, n_per_class=3, size=40):
    from PIL import Image

    rng = np.random.default_rng(0)
    classes = ["crazing", "inclusion", "patches", "pitted_surface",
               "rolled-in_scale", "scratches"]
    for split in ("train", "validation"):
        for cls in classes:
            d = os.path.join(root, split, "images", cls)
            os.makedirs(d)
            for i in range(n_per_class):
                arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
                Image.fromarray(arr, mode="L").save(os.path.join(d, f"{cls}_{i}.bmp"))


def test_load_dataset_from_bmp_tree(tmp_path):
    data_root = str(tmp_path / "NEU-DET")
    _make_neudet_tree(data_root)
    cfg = TeacherConfig(
        experiment_name="datapath",
        artifacts_root=str(tmp_path / "out"),
        data_dir=data_root,
        image_size=(48, 48),
        synthetic_data="auto",  # must pick the REAL tree, not synthesize
    )
    paths = build_img_paths(cfg)
    assert len(paths["train"]["img_paths"]) == 18
    assert sorted(set(paths["train"]["cls_ids"])) == [0, 1, 2, 3, 4, 5]

    data = load_dataset(cfg)
    imgs, labels = data["train"]
    assert imgs.shape == (18, 48, 48, 3) and imgs.dtype == np.uint8
    assert (np.bincount(labels) == 3).all()
    # grayscale BMPs → all three channels equal (decode correctness)
    assert (imgs[..., 0] == imgs[..., 1]).all()
    timgs, tlabels = data["test"]
    assert timgs.shape == (18, 48, 48, 3)
