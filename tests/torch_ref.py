"""Hand-written PyTorch models matching the reference's behavioral spec.

The reference (src/unet.py) builds MobileNetV2UNet from torchvision's
mobilenet_v2; torchvision is not installed in this image, so the encoder is
re-implemented here from the MobileNetV2 architecture (t,c,n,s table) with
state_dict key names IDENTICAL to torchvision's (`features.N.conv.M...`),
and the decoder follows the reference's module graph (`up.conv.conv.N`,
`outconv.conv.N`). That gives us:

1. golden-activation parity targets for the Flax models (tests only — this
   file is never imported by tpuseg itself);
2. a state_dict whose keys match real torchvision/reference checkpoints, so
   tpuseg.core.torch_import is exercised against the true naming scheme;
3. the CPU inference-speed denominator for BASELINE.md.

Spec sources: reference src/unet.py:7-51 (model graph, align_corners mix),
:53-121 (blocks), :124-172 (UNet/LightUNet); torchvision MobileNetV2
(t,c,n,s) = (1,16,1,1)(6,24,2,2)(6,32,3,2)(6,64,4,2)(6,96,3,1)(6,160,3,2)
(6,320,1,1) + stem conv(32,s2) + final 1x1 conv(1280).
"""

from __future__ import annotations

import torch
import torch.nn as nn

INVERTED_RESIDUAL_SETTINGS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def conv_bn_relu6(cin, cout, kernel, stride=1, groups=1):
    """torchvision ConvBNActivation: Sequential(Conv2d, BN, ReLU6)."""
    pad = (kernel - 1) // 2
    return nn.Sequential(
        nn.Conv2d(cin, cout, kernel, stride, pad, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU6(inplace=True),
    )


class InvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand_ratio):
        super().__init__()
        hidden = cin * expand_ratio
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand_ratio != 1:
            layers.append(conv_bn_relu6(cin, hidden, 1))
        layers.extend(
            [
                conv_bn_relu6(hidden, hidden, 3, stride, groups=hidden),
                nn.Conv2d(hidden, cout, 1, bias=False),
                nn.BatchNorm2d(cout),
            ]
        )
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class MobileNetV2Backbone(nn.Module):
    """`.features` indexable exactly like torchvision's mobilenet_v2."""

    def __init__(self):
        super().__init__()
        feats = [conv_bn_relu6(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s in INVERTED_RESIDUAL_SETTINGS:
            for i in range(n):
                feats.append(InvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(conv_bn_relu6(cin, 1280, 1))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


class double_conv(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, padding=1),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(inplace=True),
            nn.Conv2d(out_ch, out_ch, 3, padding=1),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.conv(x)


class inconv(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = double_conv(in_ch, out_ch)

    def forward(self, x):
        return self.conv(x)


class down(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.mpconv = nn.Sequential(nn.MaxPool2d(2), double_conv(in_ch, out_ch))

    def forward(self, x):
        return self.mpconv(x)


class up(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        # align_corners defaults to False here; the final head upsample in
        # MobileNetV2UNet uses True — the reference's deliberate asymmetry.
        self.up = nn.Upsample(scale_factor=2, mode="bilinear")
        self.conv = double_conv(in_ch, out_ch)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        return self.conv(torch.cat([x2, x1], dim=1))


class outconv(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, in_ch // 2, 1),
            nn.BatchNorm2d(in_ch // 2),
            nn.ReLU(inplace=True),
            nn.Conv2d(in_ch // 2, out_ch, 1),
        )

    def forward(self, x):
        return self.conv(x)


class TorchMobileNetV2UNet(nn.Module):
    def __init__(self, output_channels=10):
        super().__init__()
        self.backbone = MobileNetV2Backbone()
        self.down1 = self.backbone.features[:2]
        self.down2 = self.backbone.features[2:4]
        self.down3 = self.backbone.features[4:7]
        self.down4 = self.backbone.features[7:11]
        self.down5 = self.backbone.features[11:19]
        self.up1 = up(1280 + 64, 256)
        self.up2 = up(256 + 32, 128)
        self.up3 = up(128 + 24, 64)
        self.up4 = up(64 + 16, 32)
        self.outc = outconv(32, output_channels)
        self.final_upsample = nn.Upsample(
            scale_factor=2, mode="bilinear", align_corners=True
        )

    def forward(self, x):
        x1 = self.down1(x)
        x2 = self.down2(x1)
        x3 = self.down3(x2)
        x4 = self.down4(x3)
        x5 = self.down5(x4)
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return self.final_upsample(self.outc(x))


class TorchUNet(nn.Module):
    def __init__(self, output_channels=1, base_filters=64):
        super().__init__()
        f = base_filters
        self.inc = inconv(3, f)
        self.down1 = down(f, f * 2)
        self.down2 = down(f * 2, f * 4)
        self.down3 = down(f * 4, f * 4)
        self.up1 = up(f * 8, f * 2)
        self.up2 = up(f * 4, f)
        self.up3 = up(f * 2, f)
        self.sem_out = outconv(f, output_channels)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x = self.up1(x4, x3)
        x = self.up2(x, x2)
        x = self.up3(x, x1)
        return self.sem_out(x)
