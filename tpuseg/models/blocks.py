"""UNet building blocks as Flax modules (NHWC, TPU layout).

Behavioral spec: the reference's block zoo at src/unet.py:53-121 —
``double_conv`` (Conv3x3->BN->ReLU twice), ``inconv``, ``down``
(MaxPool2 + double_conv), ``up`` (bilinear x2 **align_corners=False**,
concat with skip FIRST, then double_conv; src/unet.py:94-105 — the skip
tensor is the first concat operand, which fixes channel order for weight
parity), and ``outconv`` (1x1 bottleneck head, src/unet.py:108-121).

Torch-parity details baked in:
- Conv2d uses bias=True (torch default) and padding=1 -> explicit ((1,1),(1,1)).
- BatchNorm eps=1e-5; torch momentum 0.1 == flax momentum (decay) 0.9.
- MaxPool2d(2) == max_pool window (2,2) stride (2,2) (floor mode).
Layout is NHWC (channels-last) — the efficient TPU conv layout — whereas the
reference is NCHW; the torch-weight importer transposes kernels accordingly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.ops.resize import upsample2x_bilinear

# torch BatchNorm2d defaults (src/unet.py uses nn.BatchNorm2d(out_ch) as-is)
BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax decay = 1 - torch momentum (0.1)


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation. The universal fused unit.

    XLA fuses the BN scale/shift and the activation into the conv epilogue;
    at inference the BN folds into the conv weights entirely (see
    tpuseg.export.quantize.fold_batchnorm).

    Full-int8 inference: when a "quant" variable collection is bound (built
    by tpuseg.export.int8_full.calibrate after a calibration pass), the conv
    runs as int8 x int8 -> int32 on the MXU — the input is quantized with
    the calibrated per-tensor activation scale, the kernel is stored int8
    with per-output-channel scales, and the int32 accumulator is rescaled to
    float for BN + activation. The fp32 path is untouched when the
    collection is absent.

    Quantization-aware training: when a "qat" marker collection is bound
    (tpuseg.ops.fake_quant.build_qat_markers; --train.qat) and train=True,
    the conv runs fake-quantized — input and kernel rounded to the int8
    grids the deployed graph uses, straight-through gradients — so the
    weights adapt to int8 deployment numerics. Like the int8 path, QAT
    materializes the upsample+concat (the deployed graph's shape), so the
    subpixel/Pallas upconcat rewrites are bypassed while it is on.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    # atrous/dilated conv (ASPP, tpuseg.models.deeplab). Threaded through
    # ALL apply-time conv paths (fp32, int8, QAT) so the deployed graph
    # keeps the dilation; callers pass dilation-aware explicit padding
    # (((d,d),(d,d)) for a SAME 3x3).
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    dtype: Any = jnp.float32
    stem_s2d: bool = False  # space-to-depth input transform (3ch stems)
    # how to realize conv(cat([skip, up2x(x)])) when upconcat_pair is given:
    # "pallas" = fused Pallas kernel (eval only), "subpixel" = exact
    # composite-kernel d2s rewrite (tpuseg.ops.subpixel; train + eval).
    upconcat_impl: str = "pallas"

    def _s2d_conv(self, x):
        """3x3 stride-2 stem as a 2x2 stride-1 conv over the space-to-depth
        input — 12 channels instead of 3 on the network's largest tensor
        (the classic TPU input trick; exact-equivalent kernel rearrangement,
        see tpuseg.models.mobilenetv2.space_to_depth_stem_kernel)."""
        from jax import lax

        from tpuseg.models.mobilenetv2 import (
            space_to_depth,
            space_to_depth_stem_kernel,
        )

        kernel = self.scope.get_variable("params", "conv")["kernel"]
        k2 = space_to_depth_stem_kernel(kernel)
        return lax.conv_general_dilated(
            space_to_depth(x).astype(self.dtype),
            k2.astype(self.dtype),
            (1, 1),
            ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _quantized_conv(self, x):
        import jax.numpy as jnp_
        from jax import lax

        scope = self.scope
        kq = scope.get_variable("quant", "kernel_q")
        ks = scope.get_variable("quant", "kernel_scale")
        act_scale = scope.get_variable("quant", "act_scale")
        bias = (
            scope.get_variable("quant", "bias")
            if scope.has_variable("quant", "bias")
            else None
        )
        xq = jnp_.clip(
            jnp_.round(x.astype(jnp_.float32) / act_scale), -127, 127
        ).astype(jnp_.int8)
        pad = self.padding
        if isinstance(pad, str):
            padding = pad
        else:
            padding = tuple(tuple(p) for p in pad)
        y = lax.conv_general_dilated(
            xq,
            kq,
            window_strides=self.strides,
            padding=padding,
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp_.int32,
        )
        scale = (act_scale * ks).reshape((1,) * (y.ndim - 1) + (-1,))
        y = y.astype(jnp_.float32) * scale
        if bias is not None:
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y.astype(self.dtype)

    def _qat_conv(self, x):
        """Fake-quantized conv for QAT (straight-through estimator).

        Forward numerics mirror the deployed int8 graph of _quantized_conv:
        the input rounds onto a symmetric per-tensor int8 grid and the
        kernel onto int8_full.calibrate's exact per-output-channel grid.
        Gradients pass straight through to params["conv"] (read via the
        bound scope, so they flow to the same leaves nn.Conv would own).
        """
        from jax import lax

        from tpuseg.ops.fake_quant import fake_quant_act, fake_quant_kernel

        p = self.scope.get_variable("params", "conv")
        xf = fake_quant_act(x)
        kf = fake_quant_kernel(p["kernel"])
        pad = self.padding
        padding = pad if isinstance(pad, str) else tuple(tuple(q) for q in pad)
        y = lax.conv_general_dilated(
            xf.astype(self.dtype),
            kf.astype(self.dtype),
            window_strides=self.strides,
            padding=padding,
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = p["bias"].astype(y.dtype)
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y

    def _fused_upconcat(self, skip, up_in):
        """First decoder conv via the Pallas fused upsample+concat+conv
        kernel (tpuseg.ops.pallas_kernels) — the concat never materializes.
        Reads this module's own conv params; tree layout unchanged."""
        import jax as jax_

        from tpuseg.ops.pallas_kernels import fused_upsample_concat_conv

        conv_params = self.scope.get_variable("params", "conv")
        interpret = jax_.devices()[0].platform == "cpu"
        return fused_upsample_concat_conv(
            skip,
            up_in,
            conv_params["kernel"],
            conv_params.get("bias", jnp.zeros(self.features)),
            interpret=interpret,
        ).astype(self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False, upconcat_pair=None):
        conv_done = False
        qat_on = (
            train
            and not self.is_initializing()
            and self.has_variable("qat", "on")
            and self.has_variable("params", "conv")
        )
        if upconcat_pair is not None:
            skip, up_in = upconcat_pair
            eligible = (
                not self.is_initializing()
                and self.has_variable("params", "conv")
                and self.kernel == (3, 3)
                and self.strides == (1, 1)
                and self.dilation == (1, 1)
                and self.groups == 1
                and not self.has_variable("quant", "kernel_q")
                and not qat_on  # QAT trains the deployed (materialized) graph
            )
            if eligible and self.upconcat_impl == "subpixel":
                # exact composite-kernel rewrite; valid in train AND eval
                from tpuseg.ops.subpixel import up_concat_conv_subpixel

                p = self.scope.get_variable("params", "conv")
                x = up_concat_conv_subpixel(
                    skip, up_in, p["kernel"], p.get("bias")
                ).astype(self.dtype)
                conv_done = True
            elif eligible and self.upconcat_impl == "pallas" and not train:
                x = self._fused_upconcat(skip, up_in)
                conv_done = True
            else:
                # init / train(pallas) / quant / unsupported: materialize
                from tpuseg.ops.resize import upsample2x_bilinear

                x = jnp.concatenate(
                    [skip, upsample2x_bilinear(up_in, align_corners=False)],
                    axis=-1,
                )
        if not conv_done:
            # calibration taps (no-op unless "intermediates" is mutable).
            # NOTE: int8 calibration must run with upconcat paths disabled so
            # every conv input is sown (the default model config does this).
            self.sow("intermediates", "conv_in", jnp.asarray(x, jnp.float32))
            if not train and self.has_variable("quant", "kernel_q"):
                x = self._quantized_conv(x)
            elif qat_on:
                x = self._qat_conv(x)
            elif (
                self.stem_s2d
                and not self.is_initializing()
                and self.has_variable("params", "conv")
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
                # the space-to-depth rewrite is the exact equivalent ONLY of
                # an unbiased 3x3 stride-2 conv — any other config routes to
                # the plain conv (stem_s2d is a numerics-preserving
                # apply-time path, CLAUDE.md invariant)
                and tuple(self.kernel) == (3, 3)
                and tuple(self.strides) == (2, 2)
                and tuple(self.dilation) == (1, 1)
                and not self.use_bias
                and self.groups == 1
            ):
                x = self._s2d_conv(x)
            else:
                x = nn.Conv(
                    self.features,
                    self.kernel,
                    strides=self.strides,
                    padding=self.padding,
                    kernel_dilation=self.dilation,
                    feature_group_count=self.groups,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="conv",
                )(x)
        # BN statistics in at least float32 (bf16 activations are promoted;
        # float64 — the x64 parity tests — stays float64)
        bn_dtype = jnp.promote_types(jnp.float32, x.dtype)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=bn_dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x.astype(bn_dtype)).astype(self.dtype)
        if self.act is not None:
            x = self.act(x)
        return x


class DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x 2 — reference double_conv, src/unet.py:53-68.

    ``upconcat_pair=(skip, x)`` routes the first conv through the Pallas
    fused upsample+concat+conv path (parameter tree unchanged).
    """

    features: int
    dtype: Any = jnp.float32
    upconcat_impl: str = "pallas"

    @nn.compact
    def __call__(self, x, train: bool = False, upconcat_pair=None):
        x = ConvBNAct(
            self.features,
            dtype=self.dtype,
            upconcat_impl=self.upconcat_impl,
            name="conv1",
        )(x, train, upconcat_pair=upconcat_pair)
        x = ConvBNAct(self.features, dtype=self.dtype, name="conv2")(x, train)
        return x


class Down(nn.Module):
    """MaxPool(2) then DoubleConv — reference down, src/unet.py:81-91."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class Up(nn.Module):
    """Bilinear x2 (align_corners=False), concat [skip, upsampled], DoubleConv.

    Reference up, src/unet.py:94-105. Channel order: skip first
    (torch.cat([x2, x1]) at src/unet.py:103). With ``use_pallas`` the
    upsample+concat+first-conv run as one fused Pallas kernel at inference
    (neither intermediate reaches HBM).
    """

    features: int
    dtype: Any = jnp.float32
    use_pallas: bool = False
    subpixel: bool = False  # exact composite-kernel d2s rewrite of conv1

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.subpixel or self.use_pallas:
            impl = "subpixel" if self.subpixel else "pallas"
            return DoubleConv(
                self.features,
                dtype=self.dtype,
                upconcat_impl=impl,
                name="conv",
            )(None, train, upconcat_pair=(skip, x))
        x = upsample2x_bilinear(x, align_corners=False)
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class OutConv(nn.Module):
    """Head: Conv1x1(in->in/2) -> BN -> ReLU -> Conv1x1(in/2->out).

    Reference outconv, src/unet.py:108-121; logits have no activation.
    """

    features: int  # number of output classes
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = x.shape[-1] // 2
        x = ConvBNAct(
            half, kernel=(1, 1), padding="VALID", dtype=self.dtype, name="conv1"
        )(x, train)
        x = nn.Conv(
            self.features,
            (1, 1),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(x)
        # logits in at least float32 (bf16 compute still yields f32 logits)
        return x.astype(jnp.promote_types(jnp.float32, x.dtype))
