"""Deployment CLI (cli/predict.py): files/dir/npy inputs → CSV predictions."""

import logging
import os

import numpy as np

from inference_efficient_vision_models_tpu.cli import predict as predict_cli
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.models import create_model


class _Cfg:
    batch_size = 8
    calibration_images = 16
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"


def _artifact(tmp_path):
    from inference_efficient_vision_models_tpu.cli.quantize import _save_qmodel

    spec, params, state = create_model("resnet18", num_classes=6)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("p"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))
    fold = str(tmp_path / "fold_0")
    _save_qmodel(fold, "static_int8", qmodel, spec=spec)
    return fold, q_fn


def test_predict_cli_npy_dir_and_files(tmp_path, capsys):
    from PIL import Image

    fold, q_fn = _artifact(tmp_path)
    rng = np.random.default_rng(1)

    batch = rng.integers(0, 255, (5, 64, 64, 3)).astype(np.uint8)
    npy = tmp_path / "batch.npy"
    np.save(npy, batch)

    img_dir = tmp_path / "imgs" / "sub"
    img_dir.mkdir(parents=True)
    file_imgs = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    for i, arr in enumerate(file_imgs):
        Image.fromarray(arr).save(img_dir / f"im{i}.bmp")
    lone = tmp_path / "lone.png"
    Image.fromarray(file_imgs[0]).save(lone)

    out_csv = tmp_path / "preds.csv"
    rc = predict_cli.main(
        [
            f"artifact={fold}",
            f"inputs={npy},{tmp_path / 'imgs'},{lone}",
            f"output={out_csv}",
            "image_size=(64,64)",
            "batch_size=8",
            "buckets=(1,4)",
            "topk=2",
        ]
    )
    assert rc == 0
    lines = out_csv.read_text().strip().splitlines()
    assert lines[0] == "image,rank,class_id,class_name,prob"
    assert len(lines) == 1 + (5 + 3 + 1) * 2  # topk=2 rows per image

    # rank-1 rows reproduce the direct quantized forward's argmax
    import jax.numpy as jnp

    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    want = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(batch)))).argmax(1)
    got = [int(l.split(",")[2]) for l in lines[1:] if l.split(",")[1] == "1"][:5]
    assert got == list(want)

    # class names come from the NEU-DET map for 6-class heads
    assert lines[1].split(",")[3] in (
        "crazing", "inclusion", "patches", "pitted_surface",
        "rolled-in_scale", "scratches",
    )


def test_predict_cli_experiment_resolution(tmp_path, monkeypatch):
    fold, _ = _artifact(tmp_path / "output" / "quantization" / "expX")
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(2)
    np.save(tmp_path / "b.npy", rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    rc = predict_cli.main(
        [
            "artifact=expX",
            f"inputs={tmp_path / 'b.npy'}",
            f"output={tmp_path / 'o.csv'}",
            "image_size=(64,64)",
            "batch_size=4",
        ]
    )
    assert rc == 0
    assert (tmp_path / "o.csv").read_text().count("\n") == 3  # header + 2 rows
