"""Quantization-aware training (--train.qat) tests.

QAT trains against the EXACT int8 grids the deployed graph uses
(tpuseg/export/int8_full.py), with straight-through gradients. The
reference has no quantized training (its deployment story is the
qualitative FP16/TensorRT claim, README.md:113-117); this is the
training-time half of tpuseg's measurable int8 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ops.fake_quant import (
    build_qat_markers,
    count_qat_markers,
    fake_quant_act,
    fake_quant_kernel,
)


def test_fake_quant_act_value_and_ste_grad():
    """Forward = symmetric absmax/127 quantize-dequantize; grad = identity."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32) * 3.7

    got = np.asarray(fake_quant_act(jnp.asarray(x)))
    s = np.abs(x).max() / 127.0
    want = np.round(x / s) * s
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # the quantization error is bounded by half a grid step and non-zero
    assert 0 < np.abs(got - x).max() <= s / 2 + 1e-7

    g = jax.grad(lambda t: jnp.sum(fake_quant_act(t) * 2.0))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(x))


def test_fake_quant_kernel_matches_int8_full_grid():
    """fake_quant_kernel == dequantize(calibrate's kernel quantization):
    same per-output-channel scale formula, same round/clip — the rounding
    noise trained against IS the deployed kernel error."""
    rng = np.random.default_rng(1)
    k = rng.normal(size=(3, 3, 7, 5)).astype(np.float32)
    k[..., 2] = 0.0  # all-zero channel: scale falls back to 1.0

    # the quantization lines of export.int8_full.calibrate, verbatim
    k_absmax = np.max(np.abs(k.reshape(-1, k.shape[-1])), axis=0)
    k_scale = np.where(k_absmax > 0, k_absmax / 127.0, 1.0).astype(np.float32)
    kernel_q = np.clip(np.round(k / k_scale), -127, 127).astype(np.int8)
    deployed = kernel_q.astype(np.float32) * k_scale

    got = np.asarray(fake_quant_kernel(jnp.asarray(k)))
    np.testing.assert_allclose(got, deployed, rtol=0, atol=1e-6)

    g = jax.grad(lambda t: jnp.sum(fake_quant_kernel(t)))(jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(k))


def _init_model(name="unet", **kw):
    from tpuseg.configs import ModelConfig
    from tpuseg.models.registry import build_model

    model = build_model(ModelConfig(name=name, **kw))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), train=False
    )
    return model, variables


def test_qat_markers_cover_every_convbnact():
    """One marker per ConvBNAct == one per calibration tap (the int8 deploy
    path and QAT quantize the same conv set; OutConv's bare logits conv is
    in neither)."""
    model, variables = _init_model(base_filters=4)
    markers = build_qat_markers(variables["params"])

    _, inter = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
        jnp.zeros((1, 16, 32, 3)),
        train=False,
        mutable=["intermediates"],
    )
    taps = len(jax.tree.leaves(inter["intermediates"]))
    assert count_qat_markers(markers) == taps > 0


def test_qat_forward_close_but_not_equal():
    """Binding the markers with train=True adds bounded rounding noise."""
    model, variables = _init_model(base_filters=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 3))
    bound = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    ref, _ = model.apply(bound, x, train=True, mutable=["batch_stats"])
    qat, _ = model.apply(
        {**bound, "qat": build_qat_markers(variables["params"])},
        x,
        train=True,
        mutable=["batch_stats"],
    )
    ref, qat = np.asarray(ref), np.asarray(qat)
    assert not np.array_equal(ref, qat)
    # int8 rounding noise, not a different function
    assert np.abs(ref - qat).max() < 0.1 * max(1.0, np.abs(ref).max())
    # eval path (train=False) ignores the markers entirely
    e0 = model.apply(bound, x, train=False)
    e1 = model.apply(
        {**bound, "qat": build_qat_markers(variables["params"])},
        x,
        train=False,
    )
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_qat_train_step_loss_decreases_params_tree_unchanged():
    from tpuseg.models.unet import UNet
    from tpuseg.train.train_step import create_train_state, make_train_step

    model = UNet(output_channels=4, base_filters=4)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 16, 32, 3), lr=1e-2
    )
    markers = build_qat_markers(state.params)
    step = make_train_step(donate=False, extra_collections={"qat": markers})

    # CLAUDE.md invariant: qat is an apply-time path — same param tree
    ref_state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 16, 32, 3), lr=1e-2
    )
    assert (
        jax.tree_util.tree_structure(state.params)
        == jax.tree_util.tree_structure(ref_state.params)
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 16, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(8, 16, 32)).astype(np.int32))
    losses = []
    for _ in range(8):
        state, metrics = step(state, x, y)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_trainer_qat_then_int8_deploy(tmp_path, mesh8):
    """End-to-end: --train.qat trains through the Trainer, and the resulting
    weights flow through the normal int8 deployment path (calibrate ->
    quantized apply) with close int8/fp32 agreement."""
    from tpuseg.configs import DatasetSourceConfig, load_config
    from tpuseg.export.int8_full import calibrate, count_quantized_convs
    from tpuseg.models.registry import build_model
    from tpuseg.train.trainer import Trainer

    argv = [
        "--model.name=unet", "--model.base_filters=4",
        "--data.width=32", "--data.height=16",
        "--train.batch_size=8", "--train.epochs=1",
        "--train.steps_per_epoch=2", "--train.lr=1e-2",
        "--train.qat=true",
        "--data.val_split=0.25", "--train.log_every=0",
        f"--train.checkpoint_dir={tmp_path}/ck",
    ]
    cfg = load_config(argv)
    cfg.data.sources = (
        DatasetSourceConfig(kind="synthetic", num_samples=16, weight=1.0),
    )
    tr = Trainer(cfg)
    tr.train()

    model = build_model(cfg.model)
    variables = {
        "params": tr.state.params,
        "batch_stats": tr.state.batch_stats,
    }
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32, 3))
    quant = calibrate(model, variables, [x])
    assert count_quantized_convs(quant) > 0
    fp32 = np.asarray(model.apply(variables, x, train=False))
    int8 = np.asarray(
        model.apply({**variables, "quant": quant}, x, train=False)
    )
    assert np.isfinite(int8).all()
    # int8 noise stays small relative to the logit range
    denom = max(1.0, float(np.abs(fp32).max()))
    assert np.abs(fp32 - int8).max() / denom < 0.15
