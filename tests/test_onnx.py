"""ONNX export: wire-format codec round-trip, executed graph parity, and the
reference artifact contract (opset 12, dynamic batch, input/output names —
reference convert.py:26-42) — all without the onnx package."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from tpuseg.export import onnx_proto as op
from tpuseg.export.onnx_export import export_onnx
from tpuseg.export.onnx_run import check_model, run_model
from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
from tpuseg.models.unet import LightUNet, UNet


def _jitter_bn(variables, seed=5):
    """Non-trivial BN params/stats so a mean/var/scale mixup can't hide."""
    rng = np.random.RandomState(seed)

    def stats(p, x):
        lo, hi = (0.5, 1.5) if "var" in str(p) else (-0.05, 0.05)
        return jnp.asarray(rng.uniform(lo, hi, x.shape), jnp.float32)

    def params(p, x):
        s = str(p)
        if "'bn'" in s:
            lo, hi = (0.5, 1.5) if "scale" in s else (-0.05, 0.05)
            return jnp.asarray(rng.uniform(lo, hi, x.shape), jnp.float32)
        return x

    return {
        "params": jtu.tree_map_with_path(params, variables["params"]),
        "batch_stats": jtu.tree_map_with_path(stats, variables["batch_stats"]),
    }


def _roundtrip(model, h, w, batch=2, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (batch, h, w, 3))
    variables = _jitter_bn(
        model.init(jax.random.PRNGKey(0), x, train=False)
    )
    data = export_onnx(model, variables, height=h, width=w)
    assert check_model(data) == []
    out = run_model(data, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    direct = np.asarray(model.apply(variables, x, train=False))
    got = out["output"]
    want = direct.transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 1e-5, f"round-trip rel err {rel}"
    return data


# ---------------------------------------------------------------------------
# wire-format codec


def test_proto_codec_roundtrip_all_field_types():
    w = np.random.RandomState(0).rand(4, 3, 3, 3).astype(np.float32)
    idx = np.asarray([-1, 0, 7], np.int64)  # negative int64 -> 10-byte varint
    node = op.node_proto(
        "Conv", ["x", "w"], ["y"], name="n0",
        group=1, pads=[1, 1, 1, 1], alpha=0.5, mode="linear",
        scales=[1.0, 2.0], tensor=np.asarray(6.0, np.float32),
    )
    graph = op.graph_proto(
        [node],
        name="g",
        inputs=[op.value_info_proto("x", op.FLOAT, ["batch", 3, 8, 8])],
        outputs=[op.value_info_proto("y", op.FLOAT, ["batch", 4, 8, 8])],
        initializers=[op.tensor_proto("w", w), op.tensor_proto("idx", idx)],
    )
    m = op.parse_model(op.model_proto(graph, opset_version=12))

    assert m["ir_version"] == 7
    assert m["producer_name"] == "tpuseg"
    assert m["opset_import"] == [{"domain": "", "version": 12}]
    g = m["graph"]
    np.testing.assert_array_equal(g["initializers"]["w"], w)
    np.testing.assert_array_equal(g["initializers"]["idx"], idx)
    assert g["inputs"][0]["dims"] == ["batch", 3, 8, 8]
    n = g["nodes"][0]
    assert n["op_type"] == "Conv" and n["input"] == ["x", "w"]
    assert n["attrs"]["group"] == 1
    assert n["attrs"]["pads"] == [1, 1, 1, 1]
    assert n["attrs"]["alpha"] == pytest.approx(0.5)
    assert n["attrs"]["mode"] == "linear"
    assert n["attrs"]["scales"] == pytest.approx([1.0, 2.0])
    assert float(n["attrs"]["tensor"]) == 6.0


def test_proto_codec_fuzz_tensors():
    """Random dtypes/shapes/values round-trip bit-exactly through
    TensorProto raw_data — incl. 0-d scalars, empty dims, and the int64
    negative-varint path."""
    rng = np.random.RandomState(7)
    dtypes = [np.float32, np.float16, np.float64, np.uint8, np.int8,
              np.int32, np.int64, np.bool_]
    for trial in range(40):
        dt = dtypes[trial % len(dtypes)]
        ndim = trial % 4
        shape = tuple(int(rng.randint(1, 5)) for _ in range(ndim))
        if np.dtype(dt) == np.bool_:
            arr = np.asarray(rng.rand(*shape) > 0.5)
        elif np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            arr = np.asarray(rng.randint(
                max(info.min, -(2**62)), min(int(info.max), 2**62), shape
            )).astype(dt)
        else:
            arr = np.asarray(rng.randn(*shape) * 1e3).astype(dt)
        name, back = op.parse_tensor(op.tensor_proto(f"t{trial}", arr))
        assert name == f"t{trial}"
        assert back.dtype == arr.dtype and back.shape == arr.shape
        np.testing.assert_array_equal(back, arr)


def test_varint_negative_int64_attrs():
    """Negative attribute ints survive the 10-byte two's-complement varint."""
    node = op.node_proto("X", [], ["y"], pads=[-1, 0, -(2**40), 3], i=-7)
    parsed = op.parse_node(node)
    assert parsed["attrs"]["pads"] == [-1, 0, -(2**40), 3]
    assert parsed["attrs"]["i"] == -7


def test_check_model_catches_unresolved_input():
    node = op.node_proto("Relu", ["ghost"], ["y"])
    graph = op.graph_proto(
        [node], "g",
        inputs=[op.value_info_proto("x", op.FLOAT, [1])],
        outputs=[op.value_info_proto("y", op.FLOAT, [1])],
        initializers=[],
    )
    problems = check_model(op.model_proto(graph))
    assert any("ghost" in p for p in problems)


# ---------------------------------------------------------------------------
# executed round-trip parity (serialize -> parse -> run vs model.apply)


def test_unet_onnx_roundtrip():
    _roundtrip(UNet(output_channels=3, base_filters=4), 16, 24)


def test_light_unet_onnx_roundtrip():
    _roundtrip(LightUNet(base_filters=4), 32, 32)


def test_fpn_onnx_roundtrip():
    from tpuseg.models.fpn import MobileNetV2FPN

    data = _roundtrip(
        MobileNetV2FPN(output_channels=10, fpn_channels=16, width_mult=0.25),
        32, 64, batch=1,
    )
    # the top-down pathway must ride nearest (asymmetric/floor == repeat)
    g = op.parse_model(data)["graph"]
    modes = [
        n["attrs"].get("mode") for n in g["nodes"]
        if n["op_type"] == "Resize"
    ]
    assert "nearest" in modes and "linear" in modes


def test_deeplab_onnx_roundtrip():
    from tpuseg.models.deeplab import MobileNetV2DeepLab

    data = _roundtrip(
        MobileNetV2DeepLab(
            output_channels=10, aspp_channels=16, width_mult=0.25
        ),
        32, 64, batch=2,
    )
    g = op.parse_model(data)["graph"]
    ops = {n["op_type"] for n in g["nodes"]}
    assert "GlobalAveragePool" in ops
    # the dilated ASPP branches keep their atrous geometry on the wire
    dil = sorted(
        n["attrs"]["dilations"] for n in g["nodes"]
        if n["op_type"] == "Conv" and n["attrs"]["dilations"] != [1, 1]
    )
    assert dil == [[2, 2], [4, 4], [6, 6]]


def test_mobilenetv2_unet_onnx_roundtrip():
    data = _roundtrip(
        MobileNetV2UNet(output_channels=10), 32, 64, batch=1
    )
    # the two reference resize semantics must both be present: decoder ups
    # are align_corners=False (src/unet.py:97), the final x2 is =True
    # (src/unet.py:30)
    g = op.parse_model(data)["graph"]
    modes = [
        n["attrs"]["coordinate_transformation_mode"]
        for n in g["nodes"] if n["op_type"] == "Resize"
    ]
    assert modes.count("pytorch_half_pixel") == 4
    assert modes[-1] == "align_corners"
    # relu6 is Clip(0, 6) with opset-11+ min/max inputs
    clips = [n for n in g["nodes"] if n["op_type"] == "Clip"]
    assert clips and clips[0]["input"][1:] == ["clip_min", "clip_max"]
    assert float(g["initializers"]["clip_min"]) == 0.0
    assert float(g["initializers"]["clip_max"]) == 6.0
    # depthwise convs carry the group attribute
    assert any(
        n["attrs"].get("group", 1) > 1
        for n in g["nodes"] if n["op_type"] == "Conv"
    )


def test_mobilenetv2_unet_onnx_width_mult():
    """Non-default width_mult exercises make_divisible channel rounding and
    the residual-eligibility recomputation in the exporter's encoder walk."""
    _roundtrip(
        MobileNetV2UNet(output_channels=5, width_mult=0.5), 32, 64, batch=1
    )


def test_mobilenetv2_unet_onnx_no_upsample_head():
    """upsample_head=False serving config: logits exported at H/2, and the
    declared output shape matches."""
    m = MobileNetV2UNet(output_channels=10, upsample_head=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 3))
    v = _jitter_bn(m.init(jax.random.PRNGKey(0), x, train=False))
    data = export_onnx(m, v, 32, 64)
    assert check_model(data) == []
    g = op.parse_model(data)["graph"]
    assert g["outputs"][0]["dims"] == ["batch", 10, 16, 32]
    out = run_model(data, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    want = np.asarray(m.apply(v, x, train=False)).transpose(0, 3, 1, 2)
    rel = np.abs(out["output"] - want).max() / np.abs(want).max()
    assert rel < 1e-5


def test_onnx_matches_torch_reference_semantics():
    """Cross-framework closure: weights born in TORCH (the reference's
    framework, via torch_ref + the .pth importer), exported to ONNX by
    tpuseg, executed by the interpreter — must match the TORCH model's own
    forward. This validates the ONNX artifact against reference semantics
    directly, not just against tpuseg's apply."""
    import torch

    from tests.torch_ref import TorchMobileNetV2UNet, TorchUNet
    from tpuseg.core.torch_import import import_state_dict

    for tm, flax_model, name, (h, w) in [
        (TorchUNet(output_channels=10, base_filters=8),
         UNet(output_channels=10, base_filters=8), "unet", (32, 64)),
        (TorchMobileNetV2UNet(output_channels=10),
         MobileNetV2UNet(output_channels=10), "mobilenetv2_unet", (32, 64)),
    ]:
        torch.manual_seed(0)
        for p in tm.parameters():
            p.data.uniform_(-0.1, 0.1)
        sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
        variables = import_state_dict(sd, name)

        x = np.random.RandomState(3).rand(1, 3, h, w).astype(np.float32)
        tm.eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        data = export_onnx(flax_model, variables, h, w)
        assert check_model(data) == []
        got = run_model(data, {"input": x})["output"]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# the reference artifact contract


def test_onnx_contract_dynamic_batch_and_names():
    m = UNet(output_channels=3, base_filters=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
    parsed = op.parse_model(export_onnx(m, v, 16, 16))
    assert parsed["opset_import"] == [{"domain": "", "version": 12}]
    g = parsed["graph"]
    # reference convert.py:36-41: named input/output, batch dim dynamic on both
    assert g["inputs"][0]["name"] == "input"
    assert g["outputs"][0]["name"] == "output"
    assert g["inputs"][0]["dims"] == ["batch", 3, 16, 16]
    assert g["outputs"][0]["dims"][0] == "batch"


def test_onnx_static_batch():
    m = UNet(output_channels=2, base_filters=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
    g = op.parse_model(export_onnx(m, v, 16, 16, batch=3))["graph"]
    assert g["inputs"][0]["dims"] == [3, 3, 16, 16]


def test_convert_cli_onnx(tmp_path):
    import convert

    rc = convert.main([
        "--model.name=unet", "--model.base_filters=4",
        "--data.width=64", "--data.height=32",
        "--export.format=onnx", f"--export.output={tmp_path}/m.onnx",
    ])
    assert rc == 0
    assert (tmp_path / "m.onnx").stat().st_size > 1000


def test_convert_cli_onnx_bf16_model(tmp_path):
    """ONNX from a bf16 serving config: the graph is fp32 semantics of the
    weights, so the round-trip comparator is the fp32 build (not the bf16
    live model, which differs at bf16 rounding)."""
    import convert

    rc = convert.main([
        "--model.name=unet", "--model.base_filters=4",
        "--model.compute_dtype=bfloat16",
        "--data.width=64", "--data.height=32",
        "--export.format=onnx", f"--export.output={tmp_path}/m.onnx",
    ])
    assert rc == 0


def test_convert_cli_onnx_rejects_fp16(tmp_path):
    import convert

    rc = convert.main([
        "--model.name=unet", "--model.base_filters=4",
        "--data.width=64", "--data.height=32",
        "--export.format=onnx", f"--export.output={tmp_path}/m.onnx",
        "--export.dtype=float16",
    ])
    assert rc == 1


def test_export_rejects_non_multiple_sizes():
    """Non-multiple-of-32 (MobileNetV2 families) / -of-8 (UNet) sizes must
    fail AT EXPORT: the emitted cascaded 2x resizes (and deeplab's pooled
    broadcast, scaled by height//32) only land on the encoder grids when
    the divisibility contract holds — otherwise the artifact is silently
    invalid and only the downstream consumer errors."""
    from tpuseg.models.deeplab import MobileNetV2DeepLab
    from tpuseg.models.fpn import MobileNetV2FPN

    for model, good_hw, bad_hw in (
        (MobileNetV2DeepLab(output_channels=10, aspp_channels=16,
                            width_mult=0.25), (32, 64), (48, 64)),
        (MobileNetV2FPN(output_channels=10, fpn_channels=16,
                        width_mult=0.25), (32, 64), (32, 40)),
        (MobileNetV2UNet(output_channels=10, width_mult=0.25),
         (32, 64), (40, 64)),
        (UNet(output_channels=3, base_filters=4), (16, 16), (12, 16)),
    ):
        # init at a contract-conforming size (the Flax module itself
        # cannot even trace a bad one); only the export size is bad
        x = jnp.zeros((1, *good_hw, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        with pytest.raises(ValueError, match="multiples of"):
            export_onnx(model, variables, height=bad_hw[0], width=bad_hw[1])
