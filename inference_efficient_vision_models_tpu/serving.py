"""Serving runtime: a pipelined predictor over any compiled forward.

The deployment-facing piece the reference lacks (its "serving" story is the
per-batch eval loop, `quantization/main.py:279-290`). ``Predictor`` overlaps
three stages per batch:

    host preprocess (decode/s2d, worker thread)  →  H2D + device execute
    (async dispatch; XLA queues back-to-back)    →  result gather

so the TPU never waits on the host for steady-state streams. Works with any
``(u8 images) → logits`` apply_fn — fp32/bf16 folded, dynamic int8, or the
true-int8 path — and can be constructed straight from a stage-4 artifact
directory.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def load_quantized(fold_dir: str, method: str, *, mesh=None, device_preprocess=False):
    """Restore a stage-4 artifact → (spec, model, apply_fn, host_preprocess).

    Artifact kinds are self-describing: static int8 carries "input" qparams
    (and uses the space-to-depth host layout), dynamic int8 carries "fc_q",
    fp16/bf16 casts are plain folded pytrees.

    With ``mesh``, the model is replicated over it and the returned apply_fn
    is a global-view program: pass batches sharded over the mesh's data axis
    (``parallel.shard_batch``) and XLA runs data-parallel inference with the
    logits gathered — the Predictor does this when constructed with a mesh.
    """
    import functools
    import json

    from flax import serialization

    from .compress.quant import quant_module
    from .compress.quant.engine import _dynamic_fc, s2d_preprocess
    from .data.pipeline import normalize_images
    from .models.registry import spec_from_dict
    from .models.widths import ResNetSpec
    from .utils import device_materialize

    with open(os.path.join(fold_dir, "spec.json")) as f:
        spec = spec_from_dict(json.load(f))
    qmod = quant_module(spec)
    # "<kind>_mixed" / "<kind>_fused" select an alternate executor over the
    # base artifact — static_int8_mixed (int8 1×1 + bf16 depthwise) and
    # static_int8_fused (one whole-block Pallas kernel per MBConv, see
    # fusedpath) reuse either their own CLI-saved file or the plain
    # static_int8 one.
    mixed = method.endswith("_mixed")
    fused = method.endswith("_fused")
    bf16_act = method.endswith("_bf16")  # ViT bf16-carrier over the int8 artifact
    path = os.path.join(fold_dir, f"model_{method}.msgpack")
    if (mixed or fused or bf16_act) and not os.path.exists(path):
        path = os.path.join(fold_dir, f"model_{method.rsplit('_', 1)[0]}.msgpack")
    with open(path, "rb") as f:
        model = serialization.msgpack_restore(f.read())
    model = qmod.restore_derived(model)
    if mesh is not None:
        from .parallel import replicate

        model = replicate(mesh, model)
    else:
        model = device_materialize(model)

    from .compress.quant import stemfold, wo4, wo8
    from .compress.quant.engine import float_stem_spec

    # the float/weight-only paths swap normalize+stem for the s2d-folded
    # uint8 stem (CNN families): no 3-lane-minor tensor in the program;
    # same raw-u8 input contract, s2d-layout batches also accepted
    def _stem_fn(stem_leaf, dtype):
        cfg = float_stem_spec(spec)
        if cfg is None:
            return None
        _, stride, pad, act = cfg
        return stemfold.make_float_stem_s2d(
            stem_leaf["w"], stem_leaf["b"], stride=stride, padding=pad,
            act=act, dtype=dtype,
        )

    # W4A16 artifacts may also carry int8 fallback leaves — check int4 first
    wo = wo4 if wo4.is_weight_only_int4(model) else (
        wo8 if wo8.is_weight_only(model) else None
    )
    if wo is not None:  # W8A16/W4A16: quantized weights, bf16 compute
        cfg = float_stem_spec(spec)
        sfn = (
            _stem_fn(
                jax.device_get(wo.dequantize({ "s": model[cfg[0]] }, jnp.float32)["s"]),
                jnp.bfloat16,
            )
            if cfg is not None
            else None
        )

        def wo_fwd(m, x_u8):
            f = wo.dequantize(m, jnp.bfloat16)
            if sfn is not None:
                return qmod.apply_folded(
                    spec, f, None, stem_out=sfn(x_u8)
                ).astype(jnp.float32)
            return qmod.apply_folded(
                spec, f, normalize_images(x_u8, jnp.bfloat16)
            ).astype(jnp.float32)

        return spec, model, functools.partial(jax.jit(wo_fwd), model), None
    if "input" in model:  # static int8 (optionally the mixed/fused executor)
        if fused:
            from .compress.quant import fusedpath

            if mesh is not None:
                raise ValueError("the fused executor is single-device")
            qf = device_materialize(
                jax.tree.map(
                    jnp.asarray, fusedpath.pack_fused(spec, jax.device_get(model))
                )
            )
            interp = os.environ.get("IEVM_FUSED_INTERPRET") == "1"
            fn = jax.jit(
                lambda q, x: fusedpath.apply_int8_fused(
                    spec, q, qf, x, interpret=interp
                )
            )
            return spec, model, functools.partial(fn, model), None
        apply = (
            qmod.apply_int8_mixed
            if mixed
            else qmod.apply_int8_bf16 if bf16_act else qmod.apply_int8
        )
        fn = jax.jit(lambda q, x: apply(spec, q, x))
        # only the ResNet 7×7 stem uses the space-to-depth host layout;
        # device_preprocess=True moves the relayout into the device program
        # (apply_int8 accepts raw uint8 and traces space_to_depth_device) —
        # for hosts whose cores, not the chip, are the scarce resource
        pre = (
            s2d_preprocess
            if isinstance(spec, ResNetSpec) and not device_preprocess
            else None
        )
        return spec, model, functools.partial(fn, model), pre
    from .models.vit import ViTSpec

    if isinstance(spec, ViTSpec) and "w_q" in model.get("head", {}):  # vit dynamic
        from .compress.quant import qvit

        fn = jax.jit(
            lambda m, x_u8: qvit.apply_dynamic_int8(spec, m, normalize_images(x_u8))
        )
        return spec, model, functools.partial(fn, model), None
    if "fc_q" in model:  # dynamic int8
        cfg = float_stem_spec(spec)
        sfn_d = (
            _stem_fn(jax.device_get(model[cfg[0]]), jnp.float32)
            if cfg is not None
            else None
        )

        def fwd(m, x_u8):
            if sfn_d is not None:
                feats = qmod.apply_folded(
                    spec, m, None, stem_out=sfn_d(x_u8), return_features=True
                )
            else:
                feats = qmod.apply_folded(
                    spec, m, normalize_images(x_u8), return_features=True
                )
            return _dynamic_fc(feats, m["fc_q"])

        return spec, model, functools.partial(jax.jit(fwd), model), None
    dtype = jax.tree.leaves(model)[0].dtype  # folded cast (fp16/bf16/fp32)
    cfg = float_stem_spec(spec)
    sfn_c = (
        _stem_fn(jax.device_get(model[cfg[0]]), dtype) if cfg is not None else None
    )
    if sfn_c is not None:
        fn = jax.jit(
            lambda m, x_u8: qmod.apply_folded(
                spec, m, None, stem_out=sfn_c(x_u8)
            ).astype(jnp.float32)
        )
    else:
        fn = jax.jit(
            lambda m, x_u8: qmod.apply_folded(
                spec, m, normalize_images(x_u8, dtype)
            ).astype(jnp.float32)
        )
    return spec, model, functools.partial(fn, model), None


class Predictor:
    """Batched, host-prefetching inference over a (u8 → logits) forward."""

    def __init__(
        self,
        apply_fn: Callable,
        *,
        host_preprocess: Optional[Callable] = None,
        batch_size: int = 256,
        prefetch: int = 2,
        mesh=None,
        bucket_sizes: Optional[Tuple[int, ...]] = None,
    ):
        """``mesh``: run data-parallel over a ``jax.sharding.Mesh`` — each
        batch is split over the mesh's data axis (batch_size must divide by
        its size; the tail batch is padded to full size anyway). The model
        must be placed for the same mesh (``from_artifact(..., mesh=…)``
        or ``parallel.replicate``).

        ``bucket_sizes``: optional ascending shape buckets for SHORT work —
        a request (or tail chunk) of n < batch_size images is padded only to
        the smallest bucket ≥ n instead of the full batch, so a 1-image
        request runs the bs-1 compiled program (~27× less device work at
        bs 256), the production tail-latency fix for static-shape XLA
        serving. Each distinct bucket is one extra compile, cached by XLA
        after the first hit (or pre-paid via :meth:`warmup`)."""
        self.apply_fn = apply_fn
        self.host_preprocess = host_preprocess
        self.batch_size = batch_size
        self.prefetch = max(prefetch, 1)
        self.mesh = mesh
        self.bucket_sizes = tuple(sorted(set(bucket_sizes or ())))
        if any(b < 1 or b > batch_size for b in self.bucket_sizes):
            raise ValueError(
                f"bucket_sizes {self.bucket_sizes} must lie in [1, batch_size={batch_size}]"
            )
        if mesh is not None:
            from .parallel.mesh import DATA_AXIS

            n_dp = mesh.shape[DATA_AXIS]
            for b in (batch_size, *self.bucket_sizes):
                if b % n_dp:
                    raise ValueError(
                        f"batch/bucket size {b} not divisible by data-axis size {n_dp}"
                    )

    @classmethod
    def from_artifact(
        cls,
        fold_dir: str,
        method: str = "static_int8",
        *,
        mesh=None,
        device_preprocess=False,
        **kw,
    ):
        _, _, fn, pre = load_quantized(
            fold_dir, method, mesh=mesh, device_preprocess=device_preprocess
        )
        return cls(fn, host_preprocess=pre, mesh=mesh, **kw)

    def _stage(self, chunk: np.ndarray):
        """Host batch → device array (sharded over the data axis on a mesh)."""
        if self.mesh is not None:
            from .parallel import shard_batch

            return shard_batch(self.mesh, chunk)
        return jnp.asarray(chunk)

    # -- core pipeline ------------------------------------------------------
    def _target_size(self, n: int) -> int:
        """Smallest shape bucket covering n, else the full batch."""
        for b in self.bucket_sizes:
            if n <= b:
                return b
        return self.batch_size

    def _batches(self, images: np.ndarray):
        bs = self.batch_size
        n = len(images)
        for start in range(0, n, bs):
            chunk = images[start : start + bs]
            tgt = self._target_size(len(chunk))
            pad = tgt - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            yield chunk, tgt - pad

    def warmup(self, image_shape: Tuple[int, int, int] = (224, 224, 3)) -> None:
        """Pre-compile every shape the predictor can dispatch (full batch +
        each bucket) so no production request pays a first-call compile."""
        for b in (*self.bucket_sizes, self.batch_size):
            x = np.zeros((b, *image_shape), np.uint8)
            if self.host_preprocess is not None:
                x = self.host_preprocess(x)
            np.asarray(self.apply_fn(self._stage(x)))

    def predict_logits(self, images: np.ndarray) -> np.ndarray:
        """images (N, H, W, 3) uint8 → logits (N, num_classes) fp32."""
        out = []
        q: "queue.Queue[Optional[Tuple[np.ndarray, int]]]" = queue.Queue(self.prefetch)

        def producer():
            for chunk, valid in self._batches(images):
                if self.host_preprocess is not None:
                    chunk = self.host_preprocess(chunk)
                q.put((self._stage(chunk), valid))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        pending = []  # (device_result, valid) — keep a couple in flight
        while True:
            item = q.get()
            if item is None:
                break
            x, valid = item
            pending.append((self.apply_fn(x), valid))
            if len(pending) > self.prefetch:
                r, v = pending.pop(0)
                out.append(np.asarray(r)[:v])
        for r, v in pending:
            out.append(np.asarray(r)[:v])
        t.join()
        return np.concatenate(out) if out else np.empty((0,))

    def predict(self, images: np.ndarray) -> np.ndarray:
        """→ predicted class ids (N,)."""
        return self.predict_logits(images).argmax(axis=-1)

    def predict_stream(self, batches: Iterable[np.ndarray]):
        """Generator over an unbounded stream of u8 image batches."""
        for chunk in batches:
            x = self.host_preprocess(chunk) if self.host_preprocess else chunk
            yield np.asarray(self.apply_fn(self._stage(x)))


_CLOSE = object()  # MicroBatcher shutdown sentinel


class MicroBatcher:
    """Dynamic request batching in front of a :class:`Predictor`.

    The production front-end for ONLINE serving: many concurrent clients each
    send a few images; running each request alone wastes the chip (a bs-1
    program uses a sliver of the MXU and pays a full dispatch), while static
    batching adds queueing latency. A dispatcher thread coalesces everything
    waiting — up to ``max_batch`` images or until the oldest request has
    waited ``max_wait_ms`` — into ONE device call, routed through the
    predictor's shape buckets, then scatters the logits back to per-request
    futures. Same design as Triton/TF-Serving dynamic batching, expressed
    over static-shape XLA programs.

    The reference has no serving runtime at all (its closest analog is the
    synchronous per-batch eval loop, ``/root/reference/quantization/main.py:279-290``);
    this component exists because a TPU serving deployment needs one.

    Thread-safe; ``submit`` never blocks on the device. Use as a context
    manager or call :meth:`close` to drain and stop the dispatcher.
    """

    def __init__(
        self,
        predictor: Predictor,
        *,
        max_wait_ms: float = 2.0,
        max_batch: Optional[int] = None,
    ):
        self.pred = predictor
        self.max_batch = int(max_batch or predictor.batch_size)
        if not (1 <= self.max_batch <= predictor.batch_size):
            raise ValueError(
                f"max_batch {self.max_batch} must lie in [1, predictor.batch_size="
                f"{predictor.batch_size}]"
            )
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._carry = None  # request that would have overflowed the batch
        self._lock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0
        self.n_images = 0  # valid images dispatched
        self.n_slots = 0  # padded program slots dispatched
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API ----------------------------------------------------------
    def submit(self, images: np.ndarray) -> "Future[np.ndarray]":
        """images (n, H, W, 3) uint8, n ≤ max_batch → Future of logits (n, K).

        Larger workloads are batch jobs, not online requests — send those to
        :meth:`Predictor.predict_logits`, which already chunks and pipelines.
        """
        images = np.asarray(images)
        if images.ndim != 4:
            raise ValueError(f"expected (n, H, W, C) images, got {images.shape}")
        if len(images) > self.max_batch:
            raise ValueError(
                f"request of {len(images)} images exceeds max_batch "
                f"{self.max_batch}; use Predictor.predict_logits for batch jobs"
            )
        if len(images) == 0:
            f: Future = Future()
            f.set_result(np.empty((0, 0), np.float32))
            return f
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self.n_requests += 1
            self._q.put((images, fut, len(images)))
        return fut

    def infer(self, images: np.ndarray) -> np.ndarray:
        """Blocking convenience wrapper: submit and wait for the logits."""
        return self.submit(images).result()

    def stats(self) -> dict:
        """Coalescing counters (mean_batch = valid images per device call)."""
        b = max(self.n_batches, 1)
        return {
            "requests": self.n_requests,
            "batches": self.n_batches,
            "images": self.n_images,
            "mean_batch": self.n_images / b,
            "mean_dispatch_slots": self.n_slots / b,
        }

    def close(self) -> None:
        """Drain queued requests, dispatch them, and stop the dispatcher."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._q.put(_CLOSE)
        self._thread.join()
        # A submit() racing close() can't happen (same lock), so anything
        # still queued is only the re-posted sentinel.

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher ----------------------------------------------------------
    def _loop(self) -> None:
        while True:
            if self._carry is not None:
                first, self._carry = self._carry, None
            else:
                first = self._q.get()
                if first is _CLOSE:
                    return
            batch: List[Tuple[np.ndarray, Future, int]] = [first]
            total = first[2]
            deadline = time.monotonic() + self.max_wait_s
            while total < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is _CLOSE:
                    self._q.put(_CLOSE)  # re-post: exit after this dispatch
                    break
                if total + item[2] > self.max_batch:
                    self._carry = item  # overflow → leads the next batch
                    break
                batch.append(item)
                total += item[2]
            self._dispatch(batch, total)

    def _dispatch(self, batch, total: int) -> None:
        live = [fut.set_running_or_notify_cancel() for _, fut, _ in batch]
        try:
            imgs = np.concatenate([im for im, _, _ in batch], axis=0)
            tgt = self.pred._target_size(total)
            pad = tgt - total
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            if self.pred.host_preprocess is not None:
                imgs = self.pred.host_preprocess(imgs)
            logits = np.asarray(self.pred.apply_fn(self.pred._stage(imgs)))[:total]
        except Exception as e:  # scatter the failure to every caller
            for (_, fut, _), ok in zip(batch, live):
                if ok:
                    fut.set_exception(e)
            return
        off = 0
        for (_, fut, n), ok in zip(batch, live):
            if ok:
                fut.set_result(logits[off : off + n])
            off += n
        self.n_batches += 1
        self.n_images += total
        self.n_slots += tgt
