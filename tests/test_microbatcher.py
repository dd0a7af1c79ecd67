"""MicroBatcher: dynamic request coalescing in front of the Predictor.

The online-serving front-end the reference has no analog for (its eval loop
is synchronous, /root/reference/quantization/main.py:279-290): concurrent
small requests must coalesce into one device call and scatter back.
"""

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax.numpy as jnp
import pytest

from inference_efficient_vision_models_tpu.serving import MicroBatcher, Predictor

from tests.test_serving import _save_artifacts


def _recording_predictor(fold, *, batch_size=8, bucket_sizes=None):
    base = Predictor.from_artifact(fold, "static_int8", batch_size=batch_size)
    seen = []

    def recording(x):
        seen.append(int(x.shape[0]))
        return base.apply_fn(x)

    pred = Predictor(
        recording,
        host_preprocess=base.host_preprocess,
        batch_size=batch_size,
        bucket_sizes=bucket_sizes,
    )
    return pred, seen


def test_microbatcher_coalesces_and_matches(tmp_path):
    """Six 1-image requests inside one wait window → ONE device call whose
    scattered logits equal the direct-apply oracle."""
    fold, imgs, q_fn = _save_artifacts(tmp_path)
    pred, seen = _recording_predictor(fold, batch_size=8)
    test = np.random.default_rng(7).integers(0, 255, (6, 64, 64, 3)).astype(np.uint8)

    with MicroBatcher(pred, max_wait_ms=500) as mb:
        futs = [mb.submit(test[i : i + 1]) for i in range(6)]
        logits = np.concatenate([f.result(timeout=60) for f in futs])
        stats = mb.stats()

    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(test))))
    np.testing.assert_allclose(logits, direct, rtol=1e-5, atol=1e-5)
    # All six coalesced into one padded-to-8 dispatch.
    assert stats["batches"] == 1 and stats["images"] == 6
    assert seen == [8]


def test_microbatcher_routes_through_buckets(tmp_path):
    """A lone request dispatches at the smallest covering shape bucket."""
    fold, _, _ = _save_artifacts(tmp_path)
    pred, seen = _recording_predictor(fold, batch_size=8, bucket_sizes=(1, 4))
    one = np.random.default_rng(8).integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    with MicroBatcher(pred, max_wait_ms=1) as mb:
        out = mb.infer(one)
    assert out.shape == (1, 6) and seen == [1]


def test_microbatcher_concurrent_clients_match_oracle(tmp_path):
    fold, _, q_fn = _save_artifacts(tmp_path)
    pred, _ = _recording_predictor(fold, batch_size=8)
    rng = np.random.default_rng(9)
    reqs = [rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8) for _ in range(10)]

    with MicroBatcher(pred, max_wait_ms=20) as mb:
        with ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(mb.infer, reqs))
        stats = mb.stats()

    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    for req, out in zip(reqs, outs):
        direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(req))))
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)
    assert stats["images"] == 20
    # Concurrency must have coalesced at least some requests.
    assert stats["batches"] < 10


def test_microbatcher_overflow_carries_to_next_batch(tmp_path):
    """Requests that would overflow max_batch lead the following dispatch —
    never dropped, never split."""
    fold, _, _ = _save_artifacts(tmp_path)
    pred, seen = _recording_predictor(fold, batch_size=4)
    r = np.random.default_rng(10)
    a = r.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    b = r.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    with MicroBatcher(pred, max_wait_ms=300, max_batch=4) as mb:
        fa, fb = mb.submit(a), mb.submit(b)
        assert fa.result(timeout=60).shape == (3, 6)
        assert fb.result(timeout=60).shape == (3, 6)
        assert mb.stats()["batches"] == 2


def test_microbatcher_validation_and_close(tmp_path):
    fold, _, _ = _save_artifacts(tmp_path)
    pred, _ = _recording_predictor(fold, batch_size=4)
    mb = MicroBatcher(pred, max_wait_ms=1)
    with pytest.raises(ValueError):
        mb.submit(np.zeros((5, 64, 64, 3), np.uint8))  # > max_batch
    with pytest.raises(ValueError):
        mb.submit(np.zeros((64, 64, 3), np.uint8))  # not (n, H, W, C)
    empty = mb.submit(np.zeros((0, 64, 64, 3), np.uint8))
    assert empty.result().size == 0
    mb.close()
    mb.close()  # idempotent
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((1, 64, 64, 3), np.uint8))
    with pytest.raises(ValueError):
        MicroBatcher(pred, max_batch=99)  # > predictor.batch_size


def test_microbatcher_close_drains_pending(tmp_path):
    """Requests in flight at close() still complete."""
    fold, _, _ = _save_artifacts(tmp_path)
    base = Predictor.from_artifact(fold, "static_int8", batch_size=4)

    def slow(x):
        time.sleep(0.05)
        return base.apply_fn(x)

    pred = Predictor(slow, host_preprocess=base.host_preprocess, batch_size=4)
    mb = MicroBatcher(pred, max_wait_ms=1)
    futs = [
        mb.submit(np.zeros((1, 64, 64, 3), np.uint8)) for _ in range(4)
    ]
    mb.close()
    for f in futs:
        assert f.result(timeout=60).shape == (1, 6)


def test_microbatcher_exception_scatters_to_all_futures(tmp_path):
    fold, _, _ = _save_artifacts(tmp_path)

    def boom(x):
        raise RuntimeError("device on fire")

    pred = Predictor(boom, batch_size=4)
    with MicroBatcher(pred, max_wait_ms=100) as mb:
        f1 = mb.submit(np.zeros((1, 64, 64, 3), np.uint8))
        f2 = mb.submit(np.zeros((1, 64, 64, 3), np.uint8))
        with pytest.raises(RuntimeError, match="device on fire"):
            f1.result(timeout=60)
        assert isinstance(f2.exception(timeout=60), RuntimeError)
