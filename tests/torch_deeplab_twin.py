"""Pure-torch twin of torchvision's `deeplabv3_resnet101`.

torchvision is not installed in this environment, so this reconstructs the
model module-for-module from its published structure
(torchvision/models/segmentation/deeplabv3.py, fcn.py, resnet.py;
the reference wraps exactly this model, ref nr4seg/network/deeplabv3.py:
6-19): ResNet-101 ([3, 4, 23, 3] Bottlenecks,
replace_stride_with_dilation=[False, True, True] → output stride 8),
DeepLabHead (ASPP rates 12/24/36 + image pooling + project → 3x3 conv →
BN → 1x1 classifier), FCNHead aux on layer3. Attribute names follow
torchvision exactly so `state_dict()` KEYS match the released checkpoints;
forwards follow torchvision so logits can be compared against the Flax port.
"""

import torch
import torch.nn.functional as F
from torch import nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet-101 as torchvision builds it for segmentation (OS 8; fc and
    avgpool dropped by IntermediateLayerGetter)."""

    def __init__(self, layers=(3, 4, 23, 3)):
        super().__init__()
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2, dilate=True)
        self.layer4 = self._make_layer(512, layers[3], stride=2, dilate=True)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             previous_dilation)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes, dilation=self.dilation)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        aux = self.layer3(x)
        out = self.layer4(aux)
        return {"out": out, "aux": aux}


class ASPPConv(nn.Sequential):

    def __init__(self, in_ch, out_ch, dilation):
        super().__init__(
            nn.Conv2d(in_ch, out_ch, 3, padding=dilation, dilation=dilation,
                      bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU())


class ASPPPooling(nn.Sequential):

    def __init__(self, in_ch, out_ch):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(in_ch, out_ch, 1, bias=False),
                         nn.BatchNorm2d(out_ch), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class ASPP(nn.Module):

    def __init__(self, in_ch, rates=(12, 24, 36), out_ch=256):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                              nn.BatchNorm2d(out_ch), nn.ReLU())]
        mods += [ASPPConv(in_ch, out_ch, r) for r in rates]
        mods.append(ASPPPooling(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(5 * out_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        res = torch.cat([conv(x) for conv in self.convs], dim=1)
        return self.project(res)


class DeepLabHead(nn.Sequential):

    def __init__(self, in_ch, num_classes):
        super().__init__(
            ASPP(in_ch),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, num_classes, 1))


class FCNHead(nn.Sequential):

    def __init__(self, in_ch, channels):
        inter = in_ch // 4
        super().__init__(nn.Conv2d(in_ch, inter, 3, padding=1, bias=False),
                         nn.BatchNorm2d(inter), nn.ReLU(), nn.Dropout(0.1),
                         nn.Conv2d(inter, channels, 1))


class DeepLabV3TV(nn.Module):
    """Structural + functional twin of torchvision deeplabv3_resnet101."""

    def __init__(self, num_classes=40):
        super().__init__()
        self.backbone = ResNetBackbone()
        self.classifier = DeepLabHead(2048, num_classes)
        self.aux_classifier = FCNHead(1024, num_classes)

    def forward(self, x):
        size = x.shape[-2:]
        features = self.backbone(x)
        out = self.classifier(features["out"])
        return {"out": F.interpolate(out, size=size, mode="bilinear",
                                     align_corners=False)}
