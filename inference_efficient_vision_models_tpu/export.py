"""Ahead-of-time deployment export: stage-4 artifacts → serialized StableHLO.

The reference's deployment story ends at a ``.pth`` file that needs the
whole PyTorch + model-zoo stack at the serving site
(`/root/reference/quantization/main.py:306-308`). Here the deployed unit is
a **self-contained compiled program**: ``jax.export`` lowers the quantized
forward (weights baked in as constants) to versioned, serialized StableHLO
that any later jax runtime — or a non-Python PJRT embedder — can load and
run without this package, its model zoo, or the artifact format. Exports
are multi-platform (TPU + CPU by default), so one artifact serves both the
chip and a host fallback.

On-disk layout (``<out>.ievm``): a 4-byte little-endian header-length,
a JSON header (method, input layout/shape/dtype, framework version), then
the StableHLO bytes. The only host-side contract that stays outside the
program is the static-int8 ResNet stem's space-to-depth layout — a
20-line numpy transform documented in the header (``input_layout: s2d``).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"IEVM"
_VERSION = 1


def _input_spec(
    spec, method: str, batch_size: int, image_size, device_preprocess: bool
) -> Tuple:
    """(shape, dtype, layout) the exported program consumes."""
    from .models.widths import ResNetSpec

    h, w = int(image_size[0]), int(image_size[1])
    if (
        method.startswith("static_int8")
        and isinstance(spec, ResNetSpec)
        and not device_preprocess
    ):
        # the s2d stem consumes (N, H/2, W/2, 12) uint8 (stemfold)
        return (batch_size, h // 2, w // 2, 12), "uint8", "s2d"
    return (batch_size, h, w, 3), "uint8", "nhwc"


def export_quantized(
    fold_dir: str,
    method: str = "static_int8",
    *,
    batch_size: int = 256,
    image_size=(224, 224),
    platforms: Optional[Tuple[str, ...]] = ("tpu", "cpu"),
    device_preprocess: bool = False,
) -> bytes:
    """Load a stage-4 artifact and export its forward → container bytes.

    The returned program maps uint8 images (layout per the header) to fp32
    logits; model weights are embedded as program constants.
    ``device_preprocess=True`` traces the space-to-depth relayout into the
    program, so even the static-int8 ResNet export consumes plain NHWC
    uint8 — zero host-side transforms at the deployment site.
    """
    from jax import export as jx

    from .serving import load_quantized

    spec, _model, apply_fn, _pre = load_quantized(
        fold_dir, method, device_preprocess=device_preprocess
    )
    shape, dtype, layout = _input_spec(
        spec, method, batch_size, image_size, device_preprocess
    )
    fn = jax.jit(lambda x: apply_fn(x).astype(jnp.float32))
    exported = jx.export(fn, platforms=list(platforms) if platforms else None)(
        jax.ShapeDtypeStruct(shape, jnp.dtype(dtype))
    )
    header = {
        "magic": "ievm-export",
        "version": _VERSION,
        "method": method,
        "input_shape": list(shape),
        "input_dtype": dtype,
        "input_layout": layout,
        "platforms": list(platforms) if platforms else [jx.default_export_platform()],
        "spec_kind": type(spec).__name__,
    }
    hdr = json.dumps(header).encode()
    return _MAGIC + struct.pack("<I", len(hdr)) + hdr + exported.serialize()


def save_exported(fold_dir: str, method: str, out_path: str, **kw) -> dict:
    """Export + write ``<out_path>``; returns the header dict."""
    blob = export_quantized(fold_dir, method, **kw)
    with open(out_path, "wb") as f:
        f.write(blob)
    return read_header(out_path)


def read_header(path: str) -> dict:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an ievm export (magic {magic!r})")
        (n,) = struct.unpack("<I", f.read(4))
        return json.loads(f.read(n).decode())


def load_exported(path_or_bytes):
    """→ (call, header). ``call`` maps a uint8 batch of the header's shape
    to fp32 logits; it needs only jax at the deployment site (the model
    weights and all preprocessing except s2d live inside the program)."""
    from jax import export as jx

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    if blob[:4] != _MAGIC:
        raise ValueError("not an ievm export container")
    (n,) = struct.unpack("<I", blob[4:8])
    header = json.loads(blob[8 : 8 + n].decode())
    exported = jx.deserialize(blob[8 + n :])

    def call(x_u8: np.ndarray) -> np.ndarray:
        return np.asarray(exported.call(jnp.asarray(x_u8)))

    return call, header


def s2d_layout(imgs_u8: np.ndarray) -> np.ndarray:
    """The one host-side transform an s2d export needs at the serving site
    (re-exported so deployments can vendor this single function)."""
    from .ops.space_to_depth import space_to_depth_u8

    return space_to_depth_u8(np.asarray(imgs_u8))
