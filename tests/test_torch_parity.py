"""FP32 parity: Flax models + torch_import vs the reference torch semantics.

The reference's behavior is defined by PyTorch ops (src/unet.py); these tests
build the equivalent torch model with random weights (tests/torch_ref.py,
torchvision naming), import the state_dict through tpuseg.core.torch_import,
and assert the Flax forward matches the torch forward at float32 tolerance —
including the align_corners=False (decoder, src/unet.py:97) vs =True (final
head, src/unet.py:30) asymmetry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.torch_ref import TorchMobileNetV2UNet, TorchUNet  # noqa: E402
from tpuseg.core.torch_import import import_state_dict  # noqa: E402
from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet  # noqa: E402
from tpuseg.models.unet import UNet  # noqa: E402


def _to_numpy_sd(model):
    # .copy(): .numpy() returns a VIEW sharing memory with the torch tensor —
    # a later in-place opt.step() would silently mutate the "snapshot"
    return {
        k: v.detach().cpu().numpy().copy()
        for k, v in model.state_dict().items()
    }


def _torch_forward(model, x_nchw):
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x_nchw)).numpy()


@pytest.mark.parametrize("seed", [0])
def test_unet_parity(seed):
    tm = TorchUNet(output_channels=10, base_filters=8)
    torch.manual_seed(seed)
    for p in tm.parameters():
        p.data.uniform_(-0.1, 0.1)
    rng = np.random.RandomState(seed)
    x = rng.rand(2, 3, 32, 64).astype(np.float32)

    ref = _torch_forward(tm, x)  # [B, C, H, W]

    variables = import_state_dict(_to_numpy_sd(tm), "unet")
    fm = UNet(output_channels=10, base_filters=8)
    out = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0])
def test_mobilenetv2_unet_parity(seed):
    tm = TorchMobileNetV2UNet(output_channels=10)
    torch.manual_seed(seed)
    # keep BN stats non-trivial so running-stat import is actually tested
    sd = tm.state_dict()
    g = torch.Generator().manual_seed(seed)
    for k, v in sd.items():
        if k.endswith("running_var"):
            v.uniform_(0.5, 1.5, generator=g)
        elif k.endswith("running_mean"):
            v.uniform_(-0.2, 0.2, generator=g)
        elif v.dtype.is_floating_point:
            v.uniform_(-0.05, 0.05, generator=g)

    rng = np.random.RandomState(seed)
    x = rng.rand(1, 3, 64, 128).astype(np.float32)
    ref = _torch_forward(tm, x)

    variables = import_state_dict(_to_numpy_sd(tm), "mobilenetv2_unet")
    fm = MobileNetV2UNet(output_channels=10)
    out = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_training_trajectory_parity():
    """The reference's per-batch work — zero_grad / forward / CE / backward /
    Adam step (src/train.py:31-39) — must produce the SAME loss trajectory
    and the SAME updated parameters here. Identical weights are imported
    into both frameworks, then 10 Adam steps run on identical batches
    (augment off, reference hyperparameters lr=1.5e-4 / torch-default betas
    and eps, main.py:100). This measures optimizer-step + BN-update +
    CE-gradient parity end-to-end, not just the forward.

    Run in float64 on both sides: in float32 every gradient in a BN network
    is a cancellation-dominated sum (BN backward forces upstream grads
    toward zero mean), so element-wise grads carry ~1-20% summation-order
    noise that Adam's g/sqrt(v) normalization amplifies to +-lr-sized
    update differences — fp32 param comparison after N Adam steps can only
    ever be bounded by N*lr, which catches nothing. In f64 the noise floor
    is ~1e-12, so a tight comparison is meaningful: any semantic mismatch
    (CE grad, BN train-mode stats, maxpool routing, bilinear backward,
    Adam bias correction) would show as a >1e-6 divergence."""
    import optax

    from tpuseg.train.train_step import TrainState, make_train_step

    n_steps, lr = 10, 1.5e-4
    tm = TorchUNet(output_channels=10, base_filters=8)
    g = torch.Generator().manual_seed(11)
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            v.uniform_(0.5, 1.5, generator=g)
        elif v.dtype.is_floating_point:
            v.uniform_(-0.1, 0.1, generator=g)
    tm = tm.double()

    init_sd = _to_numpy_sd(tm)  # snapshot BEFORE torch training mutates tm

    rng = np.random.RandomState(11)
    batches = [
        (
            rng.rand(2, 3, 32, 64).astype(np.float64),
            rng.randint(0, 10, (2, 32, 64)),
        )
        for _ in range(n_steps)
    ]

    # --- torch trajectory (the reference loop, src/train.py:31-39)
    opt = torch.optim.Adam(tm.parameters(), lr=lr, betas=(0.9, 0.999), eps=1e-8)
    tm.train()
    losses_ref = []
    for x, y in batches:
        opt.zero_grad()
        out = tm(torch.from_numpy(x))
        loss = torch.nn.functional.cross_entropy(out, torch.from_numpy(y))
        loss.backward()
        opt.step()
        losses_ref.append(loss.item())

    # --- tpuseg trajectory from the SAME imported starting weights
    jax.config.update("jax_enable_x64", True)
    try:
        variables = import_state_dict(init_sd, "unet")
        fm = UNet(output_channels=10, base_filters=8, dtype=jnp.float64)
        state = TrainState.create(
            apply_fn=fm.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
        )
        step = make_train_step(donate=False)
        losses_ours = []
        for x, y in batches:
            state, metrics = step(
                state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                jnp.asarray(y),
            )
            losses_ours.append(float(metrics["loss"]))

        # per-step losses
        np.testing.assert_allclose(losses_ours, losses_ref, rtol=1e-9)

        # final parameters: import torch's post-training state_dict and
        # compare tree-wise. The one analytic exception: conv biases feeding
        # straight into BN have EXACTLY-zero gradient (BN's mean subtraction
        # cancels them — a reference quirk, nn.Conv2d(bias=True) before BN),
        # so Adam moves them by g_noise/(|g_noise|+eps) ~ 1e-12/1e-8 = 1e-4
        # relative-to-lr per step: covered by atol=1e-8 like everything else.
        import jax.tree_util as jtu

        final_ref = import_state_dict(_to_numpy_sd(tm), "unet")
        jtu.tree_map_with_path(
            lambda p, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8,
                err_msg=jtu.keystr(p),
            ),
            state.params,
            final_ref["params"],
        )
        # BN running means match tightly; running var differs ONLY by
        # torch's unbiased (n/(n-1)) running-stat convention vs flax's
        # biased one — n >= 64 at the smallest feature map here, so 2%
        # relative covers the convention gap while still catching any
        # momentum/update-order mismatch
        jtu.tree_map_with_path(
            lambda p, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                rtol=2e-2 if "var" in jtu.keystr(p) else 1e-9,
                atol=1e-10, err_msg=jtu.keystr(p),
            ),
            state.batch_stats,
            final_ref["batch_stats"],
        )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_bilinear_resize_matches_torch():
    """Both align_corners conventions, exact vs torch.nn.Upsample."""
    from tpuseg.ops.resize import upsample2x_bilinear

    rng = np.random.RandomState(1)
    x = rng.rand(2, 5, 7, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for ac in (False, True):
        ref = torch.nn.functional.interpolate(
            xt, scale_factor=2, mode="bilinear", align_corners=ac
        ).numpy()
        out = np.transpose(
            np.asarray(upsample2x_bilinear(jnp.asarray(x), align_corners=ac)),
            (0, 3, 1, 2),
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_cross_entropy_matches_torch():
    from tpuseg.train.loss import cross_entropy_loss

    rng = np.random.RandomState(2)
    logits = rng.randn(2, 8, 8, 10).astype(np.float32)
    targets = rng.randint(0, 10, (2, 8, 8))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(targets),
    ).item()
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(ours - ref) < 1e-5


def test_encoder_stage_taps_match_torch():
    """Per-stage golden parity (SURVEY.md §4.2): each of the 5 encoder taps
    matches the torch backbone slices down1..down5."""
    from tests.torch_ref import TorchMobileNetV2UNet
    from tpuseg.models.mobilenetv2 import MobileNetV2Encoder

    tm = TorchMobileNetV2UNet(output_channels=10)
    g = torch.Generator().manual_seed(3)
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            v.uniform_(0.5, 1.5, generator=g)
        elif v.dtype.is_floating_point:
            v.uniform_(-0.05, 0.05, generator=g)
    tm.eval()

    x = np.random.RandomState(3).rand(1, 3, 64, 128).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        taps_ref = []
        for stage in (tm.down1, tm.down2, tm.down3, tm.down4, tm.down5):
            t = stage(t)
            taps_ref.append(t.numpy())

    variables = import_state_dict(_to_numpy_sd(tm), "mobilenetv2_unet")
    enc = MobileNetV2Encoder()
    taps = enc.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    for i, (ours, ref) in enumerate(zip(taps, taps_ref)):
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        np.testing.assert_allclose(
            ours, ref, rtol=1e-3, atol=1e-5,
            err_msg=f"stage {i+1} diverged")


def test_migration_full_frame_mask_parity():
    """The BASELINE.json gate end-to-end: a reference-style torch user's
    checkpoint + video frame, pushed through tpuseg's public Predictor,
    yields the same per-class mask as the reference inference flow
    (cv2 resize -> normalize -> forward -> argmax -> nearest upscale)."""
    import cv2

    from tests.torch_ref import TorchMobileNetV2UNet
    from tpuseg.configs import ModelConfig
    from tpuseg.infer.predictor import Predictor

    tm = TorchMobileNetV2UNet(output_channels=10)
    g = torch.Generator().manual_seed(9)
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            v.uniform_(0.5, 1.5, generator=g)
        elif v.dtype.is_floating_point:
            v.uniform_(-0.05, 0.05, generator=g)
    tm.eval()

    rng = np.random.RandomState(9)
    frame_rgb = rng.randint(0, 255, (180, 320, 3), np.uint8)

    # reference flow (inference.py:28-70 semantics)
    small = cv2.resize(frame_rgb, (256, 128), interpolation=cv2.INTER_LINEAR)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    t = (small.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        logits = tm(torch.from_numpy(
            np.transpose(t, (2, 0, 1))[None])).numpy()
    classes_ref = np.argmax(logits[0], axis=0).astype(np.uint8)
    classes_ref = cv2.resize(classes_ref, (320, 180),
                             interpolation=cv2.INTER_NEAREST)

    # tpuseg flow: .pth import + public Predictor
    import tempfile

    pth = tempfile.mktemp(suffix=".pth")
    torch.save(tm.state_dict(), pth)
    pred = Predictor(ModelConfig(name="mobilenetv2_unet"), checkpoint=pth,
                     input_hw=(128, 256), batch_size=1)
    ours = pred(frame_rgb[None])[0]

    agreement = (ours == classes_ref).mean()
    assert agreement > 0.999, f"mask agreement {agreement}"
