"""Pretrained-encoder init: torchvision-style state_dict -> train-ready ckpt.

The reference constructs its encoder ImageNet-pretrained (src/unet.py:12).
tpuseg's equivalent path is tools/import_pretrained.py: a torchvision
``mobilenet_v2`` state_dict (``features.N...`` keys) is imported onto the
encoder subtree, the decoder stays at its random init, and the result is
saved as a step-0 Orbax checkpoint that the trainer's ``init_checkpoint``
and the inference/export entry points can consume.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.torch_ref import TorchMobileNetV2UNet  # noqa: E402
from tpuseg.core.torch_import import (  # noqa: E402
    import_torchvision_encoder,
    merge_variables,
)
from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet  # noqa: E402


def _torchvision_style_sd():
    """A state_dict with torchvision's ``features.N...`` naming (the torch
    reference model registers the encoder under ``backbone.features``)."""
    tm = TorchMobileNetV2UNet(output_channels=10)
    torch.manual_seed(3)
    for p in tm.parameters():
        p.data.uniform_(-0.1, 0.1)
    sd = {
        k[len("backbone."):]: v.detach().cpu().numpy()
        for k, v in tm.state_dict().items()
        if k.startswith("backbone.features.")
    }
    # torchvision checkpoints also carry classifier weights; they are ignored
    sd["classifier.1.weight"] = np.zeros((1000, 1280), np.float32)
    sd["classifier.1.bias"] = np.zeros((1000,), np.float32)
    return sd


def test_encoder_import_merges_over_random_init():
    sd = _torchvision_style_sd()
    enc = import_torchvision_encoder(sd)
    assert set(enc["params"]) == {"backbone"}

    model = MobileNetV2UNet(output_channels=10)
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    base_params = jax.tree.map(np.asarray, init["params"])
    merged = merge_variables(base_params, enc["params"])

    # encoder leaves replaced with the imported (NCHW->NHWC) tensors
    np.testing.assert_array_equal(
        merged["backbone"]["features_0"]["conv"]["kernel"],
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)),
    )
    # decoder untouched
    np.testing.assert_array_equal(
        merged["up1"]["conv"]["conv1"]["conv"]["kernel"],
        base_params["up1"]["conv"]["conv1"]["conv"]["kernel"],
    )
    # forward still runs with the merged tree (shapes all consistent)
    out = model.apply(
        {"params": merged, "batch_stats": init["batch_stats"]},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    assert out.shape == (1, 64, 64, 10)


def test_merge_variables_rejects_bad_overlay():
    base = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}}
    with pytest.raises(KeyError):
        merge_variables(base, {"nope": np.zeros(1)})
    with pytest.raises(ValueError):
        merge_variables(base, {"a": np.zeros((3, 3))})


def test_import_pretrained_tool_end_to_end(tmp_path):
    """torch.save -> tools/import_pretrained.py -> load_variables round-trip."""
    import sys

    sys.path.insert(0, "tools")
    try:
        import import_pretrained
    finally:
        sys.path.pop(0)

    sd = _torchvision_style_sd()
    pth = tmp_path / "mobilenet_v2.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pth))
    out_dir = tmp_path / "ckpt"
    rc = import_pretrained.main(
        ["--pth", str(pth), "--out", str(out_dir)]
    )
    assert rc == 0

    from tpuseg.infer.predictor import load_variables

    variables = load_variables(str(out_dir), "mobilenetv2_unet", lambda: None)
    np.testing.assert_array_equal(
        np.asarray(
            variables["params"]["backbone"]["features_0"]["conv"]["kernel"]
        ),
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)),
    )
