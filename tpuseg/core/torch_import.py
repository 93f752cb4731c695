"""PyTorch checkpoint -> Flax parameter-tree importer.

The reference ships/consumes ``.pth`` state_dicts (torch.save at
src/train.py:77, torch.load at inference.py:24 / convert.py:23) whose key
names come from torchvision's MobileNetV2 (``backbone.features.N.conv.M...``)
plus the reference's decoder modules (``upK.conv.conv.N``, ``outc.conv.N``,
and for UNet ``inc/downK/sem_out``). This module maps such a state_dict (as
a ``{key: np.ndarray}`` dict — no torch import needed) onto the tpuseg Flax
models, handling:

- NCHW->NHWC conv kernel transpose [O,I,kh,kw] -> [kh,kw,I,O] (the same
  transform covers depthwise convs: [C,1,k,k] -> [k,k,1,C]);
- BatchNorm weight/bias -> scale/bias and running stats -> batch_stats;
- duplicate ``downN.*`` keys (the reference registers the encoder slices
  twice) are ignored in favor of ``backbone.features.*``.

This is the FP32 bit-parity gate: tests/test_torch_parity.py builds the
equivalent torch model (tests/torch_ref.py), imports its random weights
through here, and asserts logits match to float32 tolerance.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# torchvision MobileNetV2 block layout: which feature indices use expand convs
_T1_BLOCKS = {1}  # expand_ratio == 1: conv = [dw ConvBNReLU, project, BN]


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _bn_entries(flax_path, torch_prefix, sd, params, stats):
    _set(params, flax_path + ("bn", "scale"), sd[f"{torch_prefix}.weight"])
    _set(params, flax_path + ("bn", "bias"), sd[f"{torch_prefix}.bias"])
    _set(stats, flax_path + ("bn", "mean"), sd[f"{torch_prefix}.running_mean"])
    _set(stats, flax_path + ("bn", "var"), sd[f"{torch_prefix}.running_var"])


def _convbn(flax_path, conv_key, bn_prefix, sd, params, stats, bias=False):
    _set(params, flax_path + ("conv", "kernel"), _conv_kernel(sd[conv_key]))
    if bias and f"{conv_key[:-7]}.bias" in sd:
        _set(params, flax_path + ("conv", "bias"), sd[f"{conv_key[:-7]}.bias"])
    _bn_entries(flax_path, bn_prefix, sd, params, stats)


def _import_encoder(sd: Dict[str, np.ndarray], prefix: str, base: Tuple[str, ...],
                    params: dict, stats: dict) -> None:
    """Map ``{prefix}.N...`` (torchvision features) onto MobileNetV2Encoder."""
    # stem
    _convbn(base + ("features_0",), f"{prefix}.0.0.weight", f"{prefix}.0.1",
            sd, params, stats)
    for i in range(1, 18):
        fp = base + (f"features_{i}",)
        if i in _T1_BLOCKS:
            _convbn(fp + ("depthwise",), f"{prefix}.{i}.conv.0.0.weight",
                    f"{prefix}.{i}.conv.0.1", sd, params, stats)
            _set(params, fp + ("project", "conv", "kernel"),
                 _conv_kernel(sd[f"{prefix}.{i}.conv.1.weight"]))
            _bn_entries(fp + ("project",), f"{prefix}.{i}.conv.2", sd, params, stats)
        else:
            _convbn(fp + ("expand",), f"{prefix}.{i}.conv.0.0.weight",
                    f"{prefix}.{i}.conv.0.1", sd, params, stats)
            _convbn(fp + ("depthwise",), f"{prefix}.{i}.conv.1.0.weight",
                    f"{prefix}.{i}.conv.1.1", sd, params, stats)
            _set(params, fp + ("project", "conv", "kernel"),
                 _conv_kernel(sd[f"{prefix}.{i}.conv.2.weight"]))
            _bn_entries(fp + ("project",), f"{prefix}.{i}.conv.3", sd, params, stats)
    _convbn(base + ("features_18",), f"{prefix}.18.0.weight", f"{prefix}.18.1",
            sd, params, stats)


def _import_double_conv(sd, torch_prefix: str, base: Tuple[str, ...],
                        params: dict, stats: dict) -> None:
    """``{torch_prefix}.{0,1,3,4}`` (Conv,BN,ReLU,Conv,BN,ReLU) -> conv1/conv2."""
    for flax_name, conv_i, bn_i in (("conv1", 0, 1), ("conv2", 3, 4)):
        fp = base + (flax_name,)
        _set(params, fp + ("conv", "kernel"),
             _conv_kernel(sd[f"{torch_prefix}.{conv_i}.weight"]))
        _set(params, fp + ("conv", "bias"), sd[f"{torch_prefix}.{conv_i}.bias"])
        _bn_entries(fp, f"{torch_prefix}.{bn_i}", sd, params, stats)


def _import_outconv(sd, torch_prefix: str, base: Tuple[str, ...],
                    params: dict, stats: dict) -> None:
    """``{torch_prefix}.{0,1,3}`` (Conv1x1,BN,ReLU,Conv1x1) -> conv1 + conv2."""
    fp = base + ("conv1",)
    _set(params, fp + ("conv", "kernel"),
         _conv_kernel(sd[f"{torch_prefix}.0.weight"]))
    _set(params, fp + ("conv", "bias"), sd[f"{torch_prefix}.0.bias"])
    _bn_entries(fp, f"{torch_prefix}.1", sd, params, stats)
    _set(params, base + ("conv2", "kernel"),
         _conv_kernel(sd[f"{torch_prefix}.3.weight"]))
    _set(params, base + ("conv2", "bias"), sd[f"{torch_prefix}.3.bias"])


def import_mobilenetv2_unet(sd: Dict[str, np.ndarray]) -> dict:
    """state_dict of the reference MobileNetV2UNet -> Flax variables."""
    params: dict = {}
    stats: dict = {}
    prefix = (
        "backbone.features"
        if any(k.startswith("backbone.features.") for k in sd)
        else "features"
    )
    _import_encoder(sd, prefix, ("backbone",), params, stats)
    for k in ("up1", "up2", "up3", "up4"):
        _import_double_conv(sd, f"{k}.conv.conv", (k, "conv"), params, stats)
    _import_outconv(sd, "outc.conv", ("outc",), params, stats)
    return {"params": params, "batch_stats": stats}


def import_unet(sd: Dict[str, np.ndarray], nest: Tuple[str, ...] = ()) -> dict:
    """state_dict of the reference UNet (or LightUNet with nest=("unet",))."""
    params: dict = {}
    stats: dict = {}
    _import_double_conv(sd, "inc.conv.conv", nest + ("inc",), params, stats)
    for k in ("down1", "down2", "down3"):
        _import_double_conv(
            sd, f"{k}.mpconv.1.conv", nest + (k, "conv"), params, stats
        )
    for k in ("up1", "up2", "up3"):
        _import_double_conv(sd, f"{k}.conv.conv", nest + (k, "conv"), params, stats)
    _import_outconv(sd, "sem_out.conv", nest + ("sem_out",), params, stats)
    return {"params": params, "batch_stats": stats}


def import_torchvision_encoder(sd: Dict[str, np.ndarray]) -> dict:
    """ImageNet-pretrained torchvision ``mobilenet_v2`` state_dict ->
    encoder-only Flax variables (``{"params": {"backbone": ...}, ...}``).

    This is the reference's pretrained-at-construction behavior
    (src/unet.py:12: ``mobilenet_v2(weights=DEFAULT).features``): only the
    ``features.N.*`` keys are consumed; ``classifier.*`` is ignored. Merge
    the result over a randomly initialized model with
    ``merge_variables`` to get a train-ready init."""
    params: dict = {}
    stats: dict = {}
    prefix = (
        "backbone.features"
        if any(k.startswith("backbone.features.") for k in sd)
        else "features"
    )
    _import_encoder(sd, prefix, ("backbone",), params, stats)
    return {"params": params, "batch_stats": stats}


def merge_variables(base: dict, overlay: dict) -> dict:
    """Deep-merge ``overlay`` leaves over ``base`` (dicts only), validating
    that every overlay leaf exists in base with the same shape."""

    def rec(b: dict, o: dict, path: str) -> dict:
        out = dict(b)
        for k, v in o.items():
            p = f"{path}/{k}" if path else k
            if k not in b:
                raise KeyError(f"overlay key {p!r} not present in model tree")
            if isinstance(v, dict):
                if not isinstance(b[k], dict):
                    raise KeyError(f"overlay {p!r} is a subtree, model leaf")
                out[k] = rec(b[k], v, p)
            else:
                bs = np.shape(b[k])
                vs = np.shape(v)
                if bs != vs:
                    raise ValueError(f"shape mismatch at {p!r}: {vs} vs {bs}")
                out[k] = np.asarray(v)
        return out

    return rec(base, overlay, "")


def import_state_dict(sd: Dict[str, np.ndarray], model_name: str) -> dict:
    """Dispatch by tpuseg model-registry name."""
    importers = {
        "mobilenetv2_unet": import_mobilenetv2_unet,
        "unet": import_unet,
        "light_unet": lambda d: import_unet(d, nest=("unet",)),
    }
    if model_name not in importers:
        raise KeyError(f"no importer for model {model_name!r}")
    try:
        return importers[model_name](sd)
    except KeyError as e:
        sample = sorted(sd)[:3]
        raise KeyError(
            f"state_dict does not look like a {model_name!r} checkpoint: "
            f"missing key {e.args[0]!r} (checkpoint starts with {sample}). "
            "Did you pass the right --model.name?"
        ) from e


def load_pth(path: str, model_name: str) -> dict:
    """Load a reference ``.pth`` checkpoint file (requires torch on host)."""
    import torch  # local import: torch is a test/import-tool dependency only

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.detach().cpu().numpy() for k, v in raw.items()}
    return import_state_dict(sd, model_name)
