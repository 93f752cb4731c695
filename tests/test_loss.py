"""Loss subsystem: torch-parity for weighted/smoothed/ignored CE, and the
focal/dice extensions.

The reference trains with plain ``nn.CrossEntropyLoss()`` (main.py:99); the
extended options follow torch ``F.cross_entropy`` semantics exactly —
weight= (mean divides by summed target-pixel weights), label_smoothing=
(smooth term weighted per class), ignore_index= (excluded from numerator
and denominator). Torch (CPU) is the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tpuseg.train.loss import (
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    lovasz_softmax_loss,
    make_loss_fn,
)

C = 6


def _case(seed=0, b=2, h=5, w=7, ignore_at=None):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, C).astype(np.float32) * 2.0
    targets = rng.randint(0, C, size=(b, h, w)).astype(np.int32)
    if ignore_at is not None:
        targets[0, 0, :3] = ignore_at
    return logits, targets


def _torch_ce(logits, targets, weight=None, s=0.0, ignore=-100):
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))).double()
    tt = torch.from_numpy(targets).long()
    wt = None if weight is None else torch.from_numpy(np.asarray(weight)).double()
    return float(
        F.cross_entropy(
            lt, tt, weight=wt, label_smoothing=s, ignore_index=ignore
        )
    )


@pytest.mark.parametrize("smoothing", [0.0, 0.1, 0.3])
@pytest.mark.parametrize("weighted", [False, True])
def test_ce_torch_parity(weighted, smoothing):
    logits, targets = _case()
    weight = (np.arange(C, dtype=np.float64) * 0.3 + 0.5) if weighted else None
    ref = _torch_ce(logits, targets, weight=weight, s=smoothing)
    got = float(
        cross_entropy_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            class_weights=None if weight is None else jnp.asarray(weight, jnp.float32),
            label_smoothing=smoothing,
        )
    )
    assert got == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.2])
@pytest.mark.parametrize("weighted", [False, True])
def test_ce_ignore_index_torch_parity(weighted, smoothing):
    logits, targets = _case(ignore_at=255)
    weight = (np.arange(C, dtype=np.float64) * 0.3 + 0.5) if weighted else None
    ref = _torch_ce(logits, targets, weight=weight, s=smoothing, ignore=255)
    got = float(
        cross_entropy_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            class_weights=None if weight is None else jnp.asarray(weight, jnp.float32),
            label_smoothing=smoothing,
            ignore_index=255,
        )
    )
    assert got == pytest.approx(ref, rel=1e-5)


def test_focal_gamma0_equals_ce():
    logits, targets = _case(seed=1)
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    f0 = float(
        focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=0.0)
    )
    assert f0 == pytest.approx(ce, rel=1e-6)


def test_focal_downweights_vs_ce():
    # (1-p_t)^gamma <= 1 per pixel, so focal <= CE with equal weights
    logits, targets = _case(seed=2)
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    f2 = float(
        focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=2.0)
    )
    assert 0.0 < f2 < ce


def test_focal_ignore_index_drops_pixels():
    logits, targets = _case(seed=3, ignore_at=255)
    keep = targets != 255
    # oracle: focal over only the valid pixels of a flattened copy
    lv = logits[keep][None]  # [1, Nvalid, C] -> fake H dim
    tv = targets[keep][None]
    ref = float(
        focal_loss(jnp.asarray(lv)[:, :, None, :], jnp.asarray(tv)[:, :, None])
    )
    got = float(
        focal_loss(jnp.asarray(logits), jnp.asarray(targets), ignore_index=255)
    )
    assert got == pytest.approx(ref, rel=1e-5)


def test_dice_perfect_prediction_near_zero():
    _, targets = _case(seed=4)
    onehot = np.eye(C, dtype=np.float32)[targets]
    logits = onehot * 80.0  # softmax ~ one-hot
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert loss == pytest.approx(0.0, abs=1e-3)


def test_dice_hand_computed_tiny_case():
    # 1 image, 2 pixels, 2 classes (pad a third class absent from both):
    # uniform probs (0.5 each), targets [0, 1].
    logits = np.zeros((1, 1, 2, 2), np.float32)
    targets = np.array([[[0, 1]]], np.int32)
    # per class: inter = 0.5, |p| = 1.0, |t| = 1.0, smooth = 1
    # dice_c = (2*0.5 + 1) / (1 + 1 + 1) = 2/3; loss = 1 - 2/3
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert loss == pytest.approx(1.0 - 2.0 / 3.0, rel=1e-6)


def test_dice_gradient_finite():
    logits, targets = _case(seed=5)
    g = jax.grad(
        lambda l: dice_loss(l, jnp.asarray(targets))
    )(jnp.asarray(logits))
    assert bool(jnp.all(jnp.isfinite(g)))


def _lovasz_ref(logits, targets, ignore=None):
    """Literal float64 transcription of Berman et al. 2018 (flatten-batch,
    classes='present'): per class, sort |fg - p_c| descending, dot with the
    gradient of the Lovász extension of the Jaccard loss. The oracle for
    tpuseg.train.loss.lovasz_softmax_loss, including its error-0 trick for
    ignore_index (the published version filters the pixels out instead)."""
    x = logits.astype(np.float64)
    x = x - x.max(-1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(-1, keepdims=True)
    c = p.shape[-1]
    probs = p.reshape(-1, c)
    labels = targets.reshape(-1)
    if ignore is not None:
        keep = labels != ignore
        probs, labels = probs[keep], labels[keep]
    losses = []
    for k in range(c):
        fg = (labels == k).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, k])
        order = np.argsort(-errors, kind="stable")
        e, f = errors[order], fg[order]
        gts = f.sum()
        inter = gts - np.cumsum(f)
        union = gts + np.cumsum(1.0 - f)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append(float((e * jac).sum()))
    return float(np.mean(losses))


@pytest.mark.parametrize("ignore", [None, 255])
def test_lovasz_matches_reference_transcription(ignore):
    logits, targets = _case(seed=8, ignore_at=ignore)
    # make one class absent so classes='present' actually filters
    targets[targets == C - 1] = 0
    ref = _lovasz_ref(logits, targets, ignore=ignore)
    got = float(
        lovasz_softmax_loss(
            jnp.asarray(logits), jnp.asarray(targets), ignore_index=ignore
        )
    )
    assert got == pytest.approx(ref, rel=1e-5)


def test_lovasz_perfect_prediction_near_zero():
    _, targets = _case(seed=9)
    onehot = np.eye(C, dtype=np.float32)[targets]
    logits = onehot * 80.0  # softmax ~ one-hot
    loss = float(lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert loss == pytest.approx(0.0, abs=1e-3)


def test_lovasz_gradient_finite():
    logits, targets = _case(seed=10)
    g = jax.grad(
        lambda l: lovasz_softmax_loss(l, jnp.asarray(targets))
    )(jnp.asarray(logits))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_make_loss_fn_ce_lovasz_mix():
    logits, targets = _case(seed=11)
    l, t = jnp.asarray(logits), jnp.asarray(targets)
    combo = make_loss_fn("ce+lovasz", dice_weight=0.25)(l, t)
    ce = cross_entropy_loss(l, t)
    lv = lovasz_softmax_loss(l, t)
    assert float(combo) == pytest.approx(float(0.75 * ce + 0.25 * lv), rel=1e-6)


def test_make_loss_fn_ce_dice_mix():
    logits, targets = _case(seed=6)
    l, t = jnp.asarray(logits), jnp.asarray(targets)
    combo = make_loss_fn("ce+dice", dice_weight=0.25)(l, t)
    ce = cross_entropy_loss(l, t)
    dc = dice_loss(l, t)
    assert float(combo) == pytest.approx(float(0.75 * ce + 0.25 * dc), rel=1e-6)


def test_make_loss_fn_rejects_unknown():
    with pytest.raises(ValueError, match="unknown loss"):
        make_loss_fn("hinge")


def test_losses_under_jit_and_bf16():
    logits, targets = _case(seed=7)
    lb = jnp.asarray(logits, jnp.bfloat16)
    t = jnp.asarray(targets)
    for name in ("ce", "focal", "dice", "ce+dice", "lovasz", "ce+lovasz"):
        fn = jax.jit(make_loss_fn(name, class_weights=None))
        v = fn(lb, t)
        assert v.dtype == jnp.float32  # bf16 promoted inside
        assert bool(jnp.isfinite(v))


def test_make_loss_fn_rejects_unhonorable_knobs():
    # Pure IoU surrogates have no NLL term: weights/smoothing must refuse,
    # not silently drop (ADVICE r3; the ce+ mixes honor both in the CE term).
    for name in ("dice", "lovasz"):
        with pytest.raises(ValueError, match="class_weights"):
            make_loss_fn(name, class_weights=(1.0, 2.0, 1.0, 0.5))
        with pytest.raises(ValueError, match="label_smoothing"):
            make_loss_fn(name, label_smoothing=0.1)
    with pytest.raises(ValueError, match="label-smoothing"):
        make_loss_fn("focal", label_smoothing=0.1)
    # the mixes accept them
    logits, targets = _case(seed=12)
    l, t = jnp.asarray(logits), jnp.asarray(targets)
    cw = tuple(float(i % 3 + 1) for i in range(C))
    for name in ("ce+dice", "ce+lovasz"):
        v = make_loss_fn(name, class_weights=cw, label_smoothing=0.05)(l, t)
        assert bool(jnp.isfinite(v))
    # focal keeps taking class_weights (its alpha term)
    assert bool(jnp.isfinite(make_loss_fn("focal", class_weights=cw)(l, t)))


def test_train_step_with_configured_loss_decreases():
    from tests.test_train import _toy_batch, _toy_state
    from tpuseg.train.train_step import make_train_step

    state = _toy_state(lr=3e-3)
    loss_fn = make_loss_fn(
        "ce+dice", class_weights=(1.0, 2.0, 1.0, 0.5), label_smoothing=0.05
    )
    step = make_train_step(loss_fn=loss_fn)
    x, y = _toy_batch()
    losses = []
    for _ in range(12):
        state, m = step(state, x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9


def test_config_flags_parse():
    from tpuseg.configs import load_config

    cfg = load_config([
        "--train.loss=focal",
        "--train.focal_gamma=1.5",
        "--train.class_weights=1,2,3",
        "--train.label_smoothing=0.1",
        "--train.ignore_index=255",
    ])
    assert cfg.train.loss == "focal"
    assert cfg.train.focal_gamma == 1.5
    assert cfg.train.class_weights == (1.0, 2.0, 3.0)
    assert cfg.train.label_smoothing == 0.1
    assert cfg.train.ignore_index == 255


def test_trainer_build_loss_validates_class_weights():
    from tpuseg.configs import load_config
    from tpuseg.train.trainer import Trainer

    cfg = load_config([
        "--model.name=unet",
        "--model.base_filters=4",
        "--data.width=32",
        "--data.height=16",
        "--train.batch_size=8",
        "--train.log_every=0",
        "--train.class_weights=1,2",  # wrong length: 2 != 10 classes
        '--data.sources=[{"kind":"synthetic","num_samples":8,"weight":1.0}]',
    ])
    with pytest.raises(ValueError, match="class_weights"):
        Trainer(cfg)


def test_lovasz_binned_matches_exact():
    """The sort-free level-set path (bins>0, DESIGN §45) converges to the
    exact-sort value as O(1/bins); at the shipping default (256) the
    difference is noise. Gradient stays finite and descent-aligned."""
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(2, 16, 24, 10).astype(np.float32) * 2)
    targets = jnp.asarray(rng.randint(0, 10, (2, 16, 24)))
    exact = float(lovasz_softmax_loss(logits, targets))
    diffs = []
    for bins in (64, 256, 1024):
        diffs.append(
            abs(float(lovasz_softmax_loss(logits, targets, bins=bins))
                - exact)
        )
    assert diffs[1] < 1e-4 and diffs[2] < 2e-5
    assert diffs[2] <= diffs[0]  # finer bins converge toward exact

    g_ex = jax.grad(lambda l: lovasz_softmax_loss(l, targets))(logits)
    g_bn = jax.grad(
        lambda l: lovasz_softmax_loss(l, targets, bins=256)
    )(logits)
    assert bool(jnp.all(jnp.isfinite(g_bn)))
    cos = float(
        jnp.sum(g_ex * g_bn)
        / (jnp.linalg.norm(g_ex) * jnp.linalg.norm(g_bn))
    )
    assert cos > 0.8  # bin-averaged Lovász coefficients, same direction


def test_lovasz_binned_edge_cases():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32))
    targets = np.asarray(rng.randint(0, 5, (2, 16, 16)))
    targets[0, :4] = 255  # ignore_index rows
    targets = jnp.asarray(targets)
    e = float(lovasz_softmax_loss(logits, targets, ignore_index=255))
    a = float(
        lovasz_softmax_loss(logits, targets, ignore_index=255, bins=256)
    )
    assert abs(a - e) < 1e-4

    # absent classes excluded identically (classes="present")
    t0 = jnp.zeros((2, 16, 16), jnp.int32)
    assert abs(
        float(lovasz_softmax_loss(logits, t0, bins=256))
        - float(lovasz_softmax_loss(logits, t0))
    ) < 1e-4
    # perfect prediction -> ~0
    perfect = jax.nn.one_hot(t0, 5) * 20.0
    assert float(lovasz_softmax_loss(perfect, t0, bins=256)) < 1e-3


def test_make_loss_fn_lovasz_bins_routing():
    """make_loss_fn defaults to the binned path (lovasz_bins=256) and
    bins=0 restores the exact sort; both under jit."""
    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 4, (2, 8, 8)))
    exact = float(jax.jit(make_loss_fn("lovasz", lovasz_bins=0))(
        logits, targets))
    default = float(jax.jit(make_loss_fn("lovasz"))(logits, targets))
    assert exact == pytest.approx(
        float(lovasz_softmax_loss(logits, targets)), abs=1e-6
    )
    assert default == pytest.approx(exact, abs=1e-4)
    mix0 = float(jax.jit(make_loss_fn("ce+lovasz", lovasz_bins=0))(
        logits, targets))
    mix = float(jax.jit(make_loss_fn("ce+lovasz"))(logits, targets))
    assert mix == pytest.approx(mix0, abs=1e-4)


def _errors_fg(logits, targets):
    from tpuseg.train.loss import _prep

    logp, onehot, _ = _prep(logits, targets)
    c = logits.shape[-1]
    fg = jnp.reshape(onehot, (-1, c)).T
    pr = jnp.reshape(jnp.exp(logp), (-1, c)).T
    return jnp.abs(fg - pr), fg


def test_lovasz_pallas_kernels_match_scan():
    """The Pallas histogram/lookup kernels (interpret mode on CPU) must
    reproduce the XLA scan path bit-for-bit-ish: same binning, same
    telescoped value, and the custom-VJP gradient IS the scan path's
    autodiff gradient (delta-jaccard of the pixel's bin / bin count)."""
    from tpuseg.ops.lovasz_pallas import lovasz_binned_pallas
    from tpuseg.train.loss import _binned_lovasz

    rng = np.random.RandomState(0)
    # odd P (not a multiple of 128) exercises the -1 pad masking
    for shape in ((2, 16, 24, 10), (1, 3, 37, 4)):
        b, h, w, c = shape
        logits = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 2)
        targets = jnp.asarray(rng.randint(0, c, (b, h, w)))
        errors, fg = _errors_fg(logits, targets)
        scan = float(_binned_lovasz(errors, fg, 256, jnp.float32))
        pal = float(lovasz_binned_pallas(errors, fg, interpret=True))
        assert pal == pytest.approx(scan, abs=2e-6)
        g_pal = jax.grad(
            lambda e: lovasz_binned_pallas(e, fg, interpret=True)
        )(errors)
        g_scan = jax.grad(
            lambda e: _binned_lovasz(e, fg, 256, jnp.float32)
        )(errors)
        assert bool(jnp.all(jnp.isfinite(g_pal)))
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_scan), atol=1e-6
        )


def test_lovasz_pallas_disabled_on_cpu_backend():
    """On the CPU backend the dispatch must route to the XLA scan path
    (the Pallas kernels only lower on TPU; interpret mode is test-only),
    and TPUSEG_LOVASZ_PALLAS=0 is the explicit opt-out either way."""
    from tpuseg.train.loss import _lovasz_pallas_enabled

    assert not _lovasz_pallas_enabled()  # tests run on cpu backend
    import os

    os.environ["TPUSEG_LOVASZ_PALLAS"] = "0"
    try:
        assert not _lovasz_pallas_enabled()
    finally:
        del os.environ["TPUSEG_LOVASZ_PALLAS"]


def test_sharded_lovasz_pallas_op_matches_single_device():
    """The TPU multi-device path (tpuseg/ops/lovasz_pallas.py::
    make_sharded_lovasz): forward-only shard_map region + analytic
    softmax-chain gradient + custom_vjp OUTSIDE the shard_map. Pinned
    rationale: autodiff cannot transpose a shard_map holding a
    pallas_call — vma checking rejects the kernel out_shape, and
    check_vma=False was measured scaling the transposed cotangent by
    exactly 1/mesh.size. Value AND grad must match single-device."""
    from jax.sharding import Mesh

    from tpuseg.ops.lovasz_pallas import make_sharded_lovasz

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "spatial"))
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(8, 16, 32, 10).astype(np.float32) * 2)
    targets = np.asarray(rng.randint(0, 10, (8, 16, 32)))
    targets[0, :3] = 255
    targets = jnp.asarray(targets)

    for ign in (None, 255):
        fn = make_sharded_lovasz(
            mesh, spatial=True, ignore_index=ign, interpret=True
        )
        v = float(jax.jit(fn)(logits, targets))
        ref = float(
            lovasz_softmax_loss(logits, targets, ignore_index=ign, bins=256)
        )
        assert v == pytest.approx(ref, abs=1e-6)
        g = jax.grad(lambda l: jax.jit(fn)(l, targets))(logits)
        g1 = jax.grad(
            lambda l: lovasz_softmax_loss(
                l, targets, ignore_index=ign, bins=256
            )
        )(logits)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g1), atol=1e-8
        )
