"""Native C++ BMP decoder tests: build, decode parity vs PIL, fallback."""

import os

import numpy as np
import pytest

from inference_efficient_vision_models_tpu.data.native_loader import (
    decode_batch_native,
    get_lib,
)
from inference_efficient_vision_models_tpu.data.neudet import load_images


def _write_bmps(tmp_path, n=6, size=50, mode="L"):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        if mode == "L":
            arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
        else:
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        p = str(tmp_path / f"img_{i}.bmp")
        Image.fromarray(arr, mode=mode).save(p)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of native/dataloader.cpp failed"


@pytest.mark.parametrize("mode", ["L", "RGB"])
def test_native_decode_matches_pil_no_resize(tmp_path, mode):
    from PIL import Image

    paths = _write_bmps(tmp_path, n=4, size=64, mode=mode)
    out, ok = decode_batch_native(paths, (64, 64))
    assert ok.all()
    for i, p in enumerate(paths):
        ref = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(out[i], ref)


def test_native_resize_close_to_pil(tmp_path):
    from PIL import Image

    paths = _write_bmps(tmp_path, n=2, size=200, mode="L")
    out, ok = decode_batch_native(paths, (224, 224))
    assert ok.all()
    for i, p in enumerate(paths):
        ref = np.asarray(
            Image.open(p).convert("RGB").resize((224, 224), Image.BILINEAR)
        )
        # upscale bilinear: same algorithm, off-by-rounding tolerated
        assert np.mean(np.abs(out[i].astype(int) - ref.astype(int))) < 2.0


def test_load_images_falls_back_for_png(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    png = str(tmp_path / "x.png")
    Image.fromarray(arr).save(png)
    bmp = str(tmp_path / "y.bmp")
    Image.fromarray(arr).save(bmp)
    out = load_images([png, bmp], (32, 32))
    np.testing.assert_array_equal(out[0], arr)
    np.testing.assert_array_equal(out[1], arr)


def test_native_s2d_matches_numpy(tmp_path):
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    paths = _write_bmps(tmp_path, n=3, size=64, mode="RGB")
    full, ok = decode_batch_native(paths, (64, 64))
    assert ok.all()
    s2d, ok2 = decode_batch_native(paths, (64, 64), s2d=True)
    assert ok2.all() and s2d.shape == (3, 32, 32, 12)
    np.testing.assert_array_equal(s2d, space_to_depth_u8(full))


def test_s2d_batch_native_matches_pure_numpy():
    """The batch-array C++ s2d (serving host preprocess) must be byte-equal
    to the reference transpose. The reference here is written out explicitly
    because ops.space_to_depth_u8 itself routes through the native path."""
    from inference_efficient_vision_models_tpu.data.native_loader import (
        s2d_batch_native,
    )

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    for b, h, w in ((2, 64, 64), (1, 224, 224), (3, 10, 6)):
        x = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
        ref = np.ascontiguousarray(
            x.reshape(b, h // 2, 2, w // 2, 2, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 12)
        )
        got = s2d_batch_native(x)
        assert got is not None
        np.testing.assert_array_equal(got, ref)
    # odd spatial extent: native path must decline, not corrupt
    assert s2d_batch_native(rng.integers(0, 255, (1, 7, 8, 3), dtype=np.uint8)) is None
