"""MobileNetV2DeepLab — the third decoder family (DeepLabV3+/ASPP).

Pins: registry build, output shape/dtype at multiple /32 sizes, training
step improves loss, dilated-conv exactness (ConvBNAct.dilation vs a
zero-interleaved kernel), and — the design claim — the ConvBNAct apply-time
machinery (QAT markers, int8 calibration taps, BN folding) works on this
family with zero extra code, dilation included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.configs import ModelConfig
from tpuseg.models.registry import build_model


def _tiny_cfg(**kw):
    return ModelConfig(
        name="mobilenetv2_deeplab", num_classes=10, width_mult=0.25,
        base_filters=16, **kw
    )


def test_registry_and_output_shapes():
    model = build_model(_tiny_cfg())
    for h, w in ((32, 64), (64, 64)):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), train=False
        )
        out = model.apply(
            variables, jnp.zeros((2, h, w, 3)), train=False
        )
        assert out.shape == (2, h, w, 10)
        assert out.dtype == jnp.float32


def test_dilated_conv_matches_zero_interleaved_kernel():
    """ConvBNAct(dilation=(2,2)) == plain conv with the 3x3 kernel expanded
    to a 5x5 by zero-interleaving — the definition of atrous convolution."""
    from tpuseg.models.blocks import ConvBNAct

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    m_dil = ConvBNAct(4, padding=((2, 2), (2, 2)), dilation=(2, 2))
    v = m_dil.init(jax.random.PRNGKey(1), x, train=False)
    out_dil = m_dil.apply(v, x, train=False)

    k = v["params"]["conv"]["kernel"]  # (3, 3, 8, 4)
    k5 = jnp.zeros((5, 5, 8, 4)).at[::2, ::2].set(k)
    v5 = {
        "params": {
            "conv": {"kernel": k5, "bias": v["params"]["conv"]["bias"]},
            "bn": v["params"]["bn"],
        },
        "batch_stats": v["batch_stats"],
    }
    m5 = ConvBNAct(4, kernel=(5, 5), padding=((2, 2), (2, 2)))
    out5 = m5.apply(v5, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_dil), np.asarray(out5), rtol=1e-6, atol=1e-6
    )


def test_bf16_compute_fp32_logits():
    model = build_model(_tiny_cfg(compute_dtype="bfloat16"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), train=False
    )
    out = model.apply(variables, jnp.zeros((1, 32, 64, 3)), train=False)
    assert out.dtype == jnp.float32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(variables["params"])
    )


def test_train_step_improves_loss():
    from tpuseg.train.train_step import create_train_state, make_train_step

    model = build_model(_tiny_cfg())
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 64, 3), lr=5e-3
    )
    step = make_train_step(donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8, 32, 64)).astype(np.int32))
    losses = []
    for _ in range(6):
        state, metrics = step(state, x, y)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_apply_time_machinery_carries_over():
    """QAT markers, int8 calibration, and BN folding all work on the
    DeepLab family for free (built from ConvBNAct) — including the dilated
    ASPP branches, whose int8/QAT conv paths carry rhs_dilation."""
    from tpuseg.export.int8_full import calibrate, count_quantized_convs
    from tpuseg.export.quantize import fold_batchnorm
    from tpuseg.ops.fake_quant import build_qat_markers, count_qat_markers

    model = build_model(_tiny_cfg())
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), train=False
    )
    markers = build_qat_markers(variables["params"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))

    base, _ = model.apply(
        {**variables}, x, train=True, mutable=["batch_stats"]
    )
    qat, _ = model.apply(
        {**variables, "qat": markers}, x, train=True,
        mutable=["batch_stats"],
    )
    assert not np.array_equal(np.asarray(base), np.asarray(qat))

    quant = calibrate(model, variables, [x])
    assert count_quantized_convs(quant) == count_qat_markers(markers)
    fp32 = np.asarray(model.apply(variables, x, train=False))
    int8 = np.asarray(
        model.apply({**variables, "quant": quant}, x, train=False)
    )
    assert np.isfinite(int8).all()
    assert np.abs(fp32 - int8).max() < 0.2 * max(1.0, np.abs(fp32).max())

    folded = fold_batchnorm(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    )
    out_folded = np.asarray(model.apply(folded, x, train=False))
    np.testing.assert_allclose(out_folded, fp32, rtol=5e-4, atol=5e-5)
