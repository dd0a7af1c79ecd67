"""Loss math, optimizer parity, split correctness, and training smoke tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.data import (
    create_fold_split_idx,
    make_synthetic_neudet,
    Batches,
)
from inference_efficient_vision_models_tpu.train import (
    adamw_init,
    adamw_update,
    cross_entropy,
    kd_loss,
)


def test_kd_loss_matches_torch():
    """KD loss reproduces (1-α)·CE + α·KL(log_softmax(s/T), softmax(t/T))·T²
    computed with torch exactly as the reference does."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    s = rng.standard_normal((5, 6)).astype(np.float32)
    t = rng.standard_normal((5, 6)).astype(np.float32)
    y = rng.integers(0, 6, 5)
    alpha, T = 0.5, 4.0

    st, tt, yt = torch.tensor(s), torch.tensor(t), torch.tensor(y)
    loss_ce = F.cross_entropy(st, yt)
    loss_kd = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(st / T, dim=1), F.softmax(tt / T, dim=1)
    ) * (T * T)
    ref = (1 - alpha) * loss_ce + alpha * loss_kd

    total, ce, kd = kd_loss(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(y), alpha=alpha, temperature=T
    )
    np.testing.assert_allclose(float(total), float(ref), rtol=1e-5)
    np.testing.assert_allclose(float(ce), float(loss_ce), rtol=1e-5)


def test_cross_entropy_mask_ignores_padding():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((4, 6)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    full = cross_entropy(logits[:2], labels[:2])
    masked = cross_entropy(logits, labels, mask)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(2)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    g_seq = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(3)]

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.AdamW([wt], lr=1e-3)  # torch defaults incl. wd=0.01
    for g in g_seq:
        wt.grad = torch.tensor(g)
        opt_t.step()

    params = {"w": jnp.asarray(w0)}
    opt = adamw_init(params)
    for g in g_seq:
        params, opt = adamw_update(params, {"w": jnp.asarray(g)}, opt, lr=1e-3)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_stratified_kfold_matches_sklearn():
    from sklearn.model_selection import StratifiedKFold

    y = np.repeat(np.arange(6), [30, 31, 29, 33, 30, 28])
    ours = create_fold_split_idx(5, y)
    skf = StratifiedKFold(n_splits=5)
    for k, (tr, va) in enumerate(skf.split(np.zeros_like(y), y)):
        assert ours[k]["val"] == va.tolist()
        assert ours[k]["train"] == tr.tolist()


def test_batches_padding_and_shuffle():
    imgs = np.arange(10, dtype=np.uint8).reshape(10, 1, 1, 1).repeat(3, axis=3)
    labels = np.arange(10, dtype=np.int32)
    b = Batches(imgs, labels, 4, shuffle=True, seed=0)
    seen = []
    for bi, (im, lb, mask) in enumerate(b):
        assert im.shape == (4, 1, 1, 3)
        seen += [l for l, m in zip(lb, mask) if m > 0]
    assert sorted(seen) == list(range(10))
    assert mask.sum() == 2  # 10 = 4+4+2 → last batch half padded
    # training padding uses distinct wrap-around samples, not index-0 dupes
    # (train-mode BN statistics must not be biased by duplicated rows)
    assert len(set(im[:, 0, 0, 0].tolist())) == 4

    # the same loader shuffles differently on its second epoch, and a fresh
    # loader with epoch manually restored reproduces that second-epoch order
    # (resume determinism)
    b2 = Batches(imgs, labels, 4, shuffle=True, seed=0)
    epoch0 = [tuple(lb) for _, lb, _ in b2]
    epoch1 = [tuple(lb) for _, lb, _ in b2]
    assert epoch0 != epoch1
    b3 = Batches(imgs, labels, 4, shuffle=True, seed=0)
    b3.epoch = 1
    assert [tuple(lb) for _, lb, _ in b3] == epoch1


@pytest.mark.slow
def test_training_reduces_loss_smoke(tmp_path):
    """Tiny ResNet18 on tiny synthetic data: loss must drop within an epoch."""
    import logging

    from inference_efficient_vision_models_tpu.core import TeacherConfig
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.train import train_classifier

    cfg = TeacherConfig(
        experiment_name="smoke",
        output_root=str(tmp_path),
        batch_size=16,
        epochs=2,
        learning_rate=1e-3,
        image_size=(32, 32),
        compute_dtype="float32",
        synthetic_data=True,
        synthetic_size=96,
    )
    imgs, labels = make_synthetic_neudet(16, 32, seed=0)
    spec, params, state = create_model("resnet18", num_classes=6)
    logger = logging.getLogger("smoke")
    params, state, hist = train_classifier(
        cfg, spec, params, state,
        (imgs, labels), (imgs[:32], labels[:32]),
        str(tmp_path / "fold_0"), logger, save=True,
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 1.5
    # checkpoint round-trip
    from inference_efficient_vision_models_tpu.core import artifacts

    raw = artifacts.load_checkpoint_raw(str(tmp_path / "fold_0"), "best")
    assert "params" in raw and "state" in raw
    sd = artifacts.load_spec_dict(str(tmp_path / "fold_0"), "best")
    from inference_efficient_vision_models_tpu.models import ResNetSpec

    assert ResNetSpec.from_dict(sd) == spec


def test_lr_schedules():
    import jax.numpy as jnp

    from inference_efficient_vision_models_tpu.train import make_lr_schedule

    const = make_lr_schedule("constant", 1e-3, 100)
    assert float(const(jnp.int32(50))) == pytest.approx(1e-3)

    cos = make_lr_schedule("cosine", 1e-3, 100)
    assert float(cos(jnp.int32(0))) == pytest.approx(1e-3)
    assert float(cos(jnp.int32(50))) == pytest.approx(5e-4, rel=1e-3)
    assert float(cos(jnp.int32(100))) == pytest.approx(0.0, abs=1e-9)

    wc = make_lr_schedule("warmup_cosine", 1e-3, 100, warmup_steps=10,
                          min_fraction=0.1)
    assert float(wc(jnp.int32(0))) == pytest.approx(0.0)
    assert float(wc(jnp.int32(5))) == pytest.approx(5e-4)
    assert float(wc(jnp.int32(10))) == pytest.approx(1e-3)
    assert float(wc(jnp.int32(100))) == pytest.approx(1e-4, rel=1e-3)

    with pytest.raises(ValueError):
        make_lr_schedule("poly", 1e-3, 100)


def test_train_step_with_schedule_runs():
    import jax

    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.train import (
        adamw_init,
        make_lr_schedule,
        make_train_step,
    )

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    sched = make_lr_schedule("warmup_cosine", 1e-3, 20, warmup_steps=3)
    step = make_train_step(
        spec, learning_rate=1e-3, compute_dtype="float32", lr_schedule=sched
    )
    rng = np.random.default_rng(0)
    batch = (
        rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 4).astype(np.int32),
        np.ones(4, np.float32),
    )
    p, s, o, m = step(params, state, adamw_init(params), batch)
    assert np.isfinite(float(m["loss"]))
    assert int(o.step) == 1


def test_kd_step_cross_family():
    """KD pairs any teacher family with any student family (the reference's
    create_model accepts arbitrary backbones for either role,
    `knowledge_distillation/utils.py:21-50`): ResNet18 teacher distilling
    into a MobileNetV2 student, one jitted step, finite loss, params move."""
    import jax

    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.train.optim import adamw_init
    from inference_efficient_vision_models_tpu.train.steps import make_kd_train_step

    t_spec, t_params, t_state = create_model("resnet18", num_classes=6)
    s_spec, s_params, s_state = create_model("mobilenet_v2", num_classes=6)
    step = make_kd_train_step(
        s_spec, t_spec, alpha=0.5, temperature=4.0, learning_rate=1e-3,
        compute_dtype="float32",
    )
    rng = np.random.default_rng(0)
    batch = (
        rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 4).astype(np.int32),
        np.ones(4, np.float32),
    )
    before = np.asarray(jax.device_get(s_params["stem"]["w"]))  # step donates its inputs
    p2, _, _, m = step(s_params, s_state, adamw_init(s_params), t_params, t_state, batch)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["kd"]))
    after = np.asarray(jax.device_get(p2["stem"]["w"]))
    assert not np.allclose(before, after)


def test_sp_kd_loss_math():
    """sp_kd_loss == hand-computed normalized-Gram Frobenius distance; zero
    for identical features; dimension-free (different feat dims compare)."""
    from inference_efficient_vision_models_tpu.train import sp_kd_loss

    rng = np.random.default_rng(3)
    f_s = rng.standard_normal((4, 8)).astype(np.float32)
    f_t = rng.standard_normal((4, 16)).astype(np.float32)

    def ref(fs, ft):
        def ng(f):
            g = f @ f.T
            return g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-12)

        return float(((ng(fs) - ng(ft)) ** 2).sum()) / fs.shape[0] ** 2

    got = float(sp_kd_loss(jnp.asarray(f_s), jnp.asarray(f_t)))
    np.testing.assert_allclose(got, ref(f_s, f_t), rtol=1e-5)
    assert float(sp_kd_loss(jnp.asarray(f_s), jnp.asarray(f_s))) < 1e-10


def test_sp_kd_loss_mask_ignores_padding():
    """Padded (masked-out) rows contribute nothing: loss over a padded batch
    with the mask equals the loss over the unpadded batch."""
    from inference_efficient_vision_models_tpu.train import sp_kd_loss

    rng = np.random.default_rng(5)
    f_s = rng.standard_normal((3, 8)).astype(np.float32)
    f_t = rng.standard_normal((3, 8)).astype(np.float32)
    pad = np.zeros((2, 8), np.float32)
    f_s_p = np.concatenate([f_s, pad + 7.0])  # garbage in padded rows
    f_t_p = np.concatenate([f_t, pad - 3.0])
    mask = np.array([1, 1, 1, 0, 0], np.float32)

    want = float(sp_kd_loss(jnp.asarray(f_s), jnp.asarray(f_t)))
    got = float(sp_kd_loss(jnp.asarray(f_s_p), jnp.asarray(f_t_p), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "name", ["resnet18", "mobilenet_v2_050", "efficientnet_b0", "vit_tiny_patch16_224"]
)
def test_features_and_logits_matches_apply(name):
    """The manual head application in features_and_logits reproduces the
    stock forward's logits for every family."""
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.models.registry import (
        apply_model,
        features_and_logits,
    )

    size = 224 if name.startswith("vit") else 64
    spec, params, state = create_model(name, num_classes=6)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, size, size, 3)), jnp.float32
    )
    want, _ = apply_model(spec, params, state, x, train=False)
    feats, got, _ = features_and_logits(spec, params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert feats.shape[0] == 2 and feats.ndim == 2


def test_kd_step_sp_weight():
    """sp_weight>0: the sp metric is live and the extra loss term changes the
    update; sp_weight=0 reproduces the stock KD step exactly."""
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.train.optim import adamw_init
    from inference_efficient_vision_models_tpu.train.steps import make_kd_train_step

    t_spec, t_params, t_state = create_model("resnet18", num_classes=6)
    s_spec, s_params, s_state = create_model("mobilenet_v2_050", num_classes=6)
    rng = np.random.default_rng(1)
    batch = (
        rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 4).astype(np.int32),
        np.ones(4, np.float32),
    )
    kw = dict(alpha=0.5, temperature=4.0, learning_rate=1e-3, compute_dtype="float32")

    def run(sp_weight):
        step = make_kd_train_step(s_spec, t_spec, sp_weight=sp_weight, **kw)
        # fresh copies: the step donates params/state/opt buffers
        p = jax.tree.map(jnp.array, s_params)
        st = jax.tree.map(jnp.array, s_state)
        p2, _, _, m = step(p, st, adamw_init(p), t_params, t_state, batch)
        return jax.device_get(p2), jax.device_get(m)

    p_plain, m_plain = run(0.0)
    p_sp, m_sp = run(10.0)
    assert float(m_plain["sp"]) == 0.0
    assert float(m_sp["sp"]) > 0.0 and np.isfinite(float(m_sp["loss"]))
    # the sp term actually steers the update
    assert not np.allclose(p_plain["stem"]["w"], p_sp["stem"]["w"])
    # and the plain path keeps the reference loss: loss == (1-α)CE + αKD
    np.testing.assert_allclose(
        float(m_plain["loss"]),
        0.5 * float(m_plain["ce"]) + 0.5 * float(m_plain["kd"]),
        rtol=1e-6,
    )
