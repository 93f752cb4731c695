"""Knowledge distillation (tpuseg.train.distill; --train.distill_*).

Pins: the KD KL loss against a numpy reference, its teacher==student zero /
zero-gradient properties, T^2 scaling, the combined-loss mix, and the
Trainer end to end — teacher checkpoint -> distilled student — on both the
single-step and the scan-chained multi-step dispatch paths, including the
build-time config-mismatch guards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.configs import DatasetSourceConfig, load_config
from tpuseg.train.distill import kd_kl_loss, make_distill_loss


def _np_kd(s, t, temp):
    """Numpy reference: mean per-pixel T^2 * KL(softmax(t/T)||softmax(s/T))."""
    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    slp = logsoftmax(s / temp)
    tlp = logsoftmax(t / temp)
    tp = np.exp(tlp)
    return (tp * (tlp - slp)).sum(-1).mean() * temp * temp


def test_kd_loss_matches_numpy_reference():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(2, 4, 6, 5)).astype(np.float32) * 3
    t = rng.normal(size=(2, 4, 6, 5)).astype(np.float32) * 3
    for temp in (1.0, 2.0, 4.0):
        got = float(kd_kl_loss(jnp.asarray(s), jnp.asarray(t), temp))
        np.testing.assert_allclose(got, _np_kd(s, t, temp), rtol=1e-5)


def test_kd_loss_zero_and_zero_grad_at_teacher_equals_student():
    """KL(p||p) = 0 and is a minimum — loss and gradient both vanish when
    the student already matches the teacher (the reason the KL form, not
    soft-CE, is used; they differ by the constant teacher entropy)."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 5)).astype(np.float32))
    assert abs(float(kd_kl_loss(logits, logits, 2.0))) < 1e-6
    g = jax.grad(lambda s: kd_kl_loss(s, logits, 2.0))(logits)
    assert float(jnp.abs(g).max()) < 1e-6
    # and strictly positive away from the teacher
    assert float(kd_kl_loss(logits + 1e-1 * logits**2, logits, 2.0)) > 0


def test_distill_loss_mixes_base_and_kd():
    from tpuseg.train.loss import cross_entropy_loss

    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(2, 4, 4, 5)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 4, 4, 5)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(2, 4, 4)).astype(np.int32))
    ce = float(cross_entropy_loss(s, y))
    kd = float(kd_kl_loss(s, t, 3.0))
    mixed = make_distill_loss(cross_entropy_loss, 0.25, 3.0)
    np.testing.assert_allclose(
        float(mixed(s, y, t)), 0.75 * ce + 0.25 * kd, rtol=1e-6
    )
    # alpha=1: pure soft targets, label-independent
    pure = make_distill_loss(cross_entropy_loss, 1.0, 3.0)
    np.testing.assert_allclose(float(pure(s, y, t)), kd, rtol=1e-6)
    np.testing.assert_allclose(
        float(pure(s, jnp.zeros_like(y), t)), kd, rtol=1e-6
    )


def test_distill_loss_ignore_index_masks_kd_term():
    """ignore_index pixels are excluded from the KD mean too — the teacher
    was never supervised there. Verified against an explicit numpy mask."""
    from tpuseg.train.loss import cross_entropy_loss

    rng = np.random.default_rng(4)
    s = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    t = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    y = rng.integers(0, 5, size=(2, 4, 4)).astype(np.int32)
    y[0, :2] = 255  # ignored region
    temp = 2.0

    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    kl = (np.exp(logsoftmax(t / temp))
          * (logsoftmax(t / temp) - logsoftmax(s / temp))).sum(-1)
    valid = (y != 255)
    want_kd = kl[valid].mean() * temp * temp

    pure = make_distill_loss(
        cross_entropy_loss, 1.0, temp, ignore_index=255
    )
    np.testing.assert_allclose(
        float(pure(jnp.asarray(s), jnp.asarray(y), jnp.asarray(t))),
        want_kd, rtol=1e-5,
    )
    # alpha outside (0, 1] is a build-time error (alpha=0 is handled by the
    # Trainer skipping distillation entirely)
    with pytest.raises(ValueError, match="alpha"):
        make_distill_loss(cross_entropy_loss, 0.0, temp)
    with pytest.raises(ValueError, match="alpha"):
        make_distill_loss(cross_entropy_loss, 1.5, temp)


def _train_argv(tmp_path, name, extra=()):
    return [
        "--model.name=unet", "--model.base_filters=4",
        "--data.width=32", "--data.height=16",
        "--train.batch_size=8", "--train.epochs=1",
        "--train.steps_per_epoch=3", "--train.lr=1e-3",
        f"--train.checkpoint_dir={tmp_path}/{name}",
        "--data.val_split=0.25", "--train.log_every=0",
        *extra,
    ]


def _cfg(tmp_path, name, extra=()):
    cfg = load_config(_train_argv(tmp_path, name, extra))
    cfg.data.sources = (
        DatasetSourceConfig(kind="synthetic", num_samples=16, weight=1.0),
    )
    return cfg


@pytest.fixture(scope="module")
def teacher_ckpt(tmp_path_factory):
    """A briefly-trained unet bf=4 teacher checkpoint."""
    from tpuseg.train.trainer import Trainer

    tmp_path = tmp_path_factory.mktemp("distill")
    t = Trainer(_cfg(tmp_path, "teacher"))
    t.train()
    t.ckpt.wait()
    return f"{tmp_path}/teacher"


def test_trainer_distills_single_and_multi_step(tmp_path, teacher_ckpt):
    from tpuseg.train.trainer import Trainer

    for name, extra in (
        ("stud1", []),
        ("stud8", ["--train.steps_per_dispatch=3"]),
    ):
        cfg = _cfg(
            tmp_path, name,
            [f"--train.distill_checkpoint={teacher_ckpt}",
             "--train.distill_alpha=0.5", "--train.distill_temperature=2.0",
             *extra],
        )
        hist = Trainer(cfg).train()
        assert len(hist) == 1
        assert np.isfinite(hist[0]["train_loss"])
        assert "val_miou" in hist[0]


def test_distill_loss_actually_pulls_toward_teacher(teacher_ckpt):
    """alpha=1 (labels ignored): a fresh student's logits move measurably
    closer to the teacher's after a few KD-only steps."""
    from tpuseg.infer.predictor import load_variables
    from tpuseg.models.unet import UNet
    from tpuseg.train.distill import make_teacher_fn
    from tpuseg.train.train_step import create_train_state, make_train_step

    teacher = UNet(output_channels=10, base_filters=4)
    t_vars = load_variables(teacher_ckpt, "unet", lambda: None)
    t_vars = {"params": t_vars["params"],
              "batch_stats": t_vars["batch_stats"]}
    teacher_fn = make_teacher_fn(teacher, t_vars)

    student = UNet(output_channels=10, base_filters=4)
    state = create_train_state(
        student, jax.random.PRNGKey(7), (1, 16, 32, 3), lr=3e-3
    )
    step = make_train_step(
        donate=False,
        loss_fn=make_distill_loss(lambda l, y: 0.0, 1.0, 2.0),
        teacher_fn=teacher_fn,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((8, 16, 32, 3)).astype(np.float32))
    y = jnp.zeros((8, 16, 32), jnp.int32)  # ignored at alpha=1
    losses = []
    for _ in range(10):
        state, m = step(state, x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7  # KL toward teacher shrinks


def test_distill_config_mismatch_raises(tmp_path, teacher_ckpt):
    from tpuseg.train.trainer import Trainer

    cfg = _cfg(
        tmp_path, "bad",
        [f"--train.distill_checkpoint={teacher_ckpt}",
         "--train.distill_base_filters=8"],  # teacher was bf=4
    )
    with pytest.raises(ValueError, match="does not match teacher"):
        Trainer(cfg)
