"""Forward-output parity between the Flax models and torch oracles built to
the reference architectures (ref:07:75-120, ref:14:96-186, torchvision
VGG16-D per ref:05:47-56), weights shared through tsr_tpu.checkpoint."""

import jax
import numpy as np
import pytest
import torch
import torch.nn as tnn

from tsr_tpu import checkpoint
from tsr_tpu.models import ResUNet, SimpleUNet, VGG16

HI = jax.lax.Precision.HIGHEST

torch.manual_seed(0)


# ----------------------------------------------------------------- oracles

class TorchSimpleUNet(tnn.Module):
    """ref:07:75-120."""

    def __init__(self):
        super().__init__()
        def dc(i, o):
            return tnn.Sequential(tnn.Conv2d(i, o, 3, padding=1), tnn.ReLU(),
                                  tnn.Conv2d(o, o, 3, padding=1), tnn.ReLU())
        self.enc1 = dc(3, 64)
        self.pool1 = tnn.MaxPool2d(2, 2)
        self.enc2 = dc(64, 128)
        self.pool2 = tnn.MaxPool2d(2, 2)
        self.bottleneck = dc(128, 256)
        self.up2 = tnn.ConvTranspose2d(256, 128, 2, stride=2)
        self.dec2 = dc(256, 128)
        self.up1 = tnn.ConvTranspose2d(128, 64, 2, stride=2)
        self.dec1 = dc(128, 64)
        self.final = tnn.Conv2d(64, 3, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(self.pool1(e1))
        b = self.bottleneck(self.pool2(e2))
        d2 = self.dec2(torch.cat((self.up2(b), e2), dim=1))
        d1 = self.dec1(torch.cat((self.up1(d2), e1), dim=1))
        return self.final(d1)


class TorchResBlock(tnn.Module):
    """ref:14:96-115."""

    def __init__(self, i, o):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.Conv2d(i, o, 3, padding=1), tnn.BatchNorm2d(o), tnn.PReLU(),
            tnn.Conv2d(o, o, 3, padding=1), tnn.BatchNorm2d(o))
        self.shortcut = tnn.Sequential()
        if i != o:
            self.shortcut = tnn.Sequential(tnn.Conv2d(i, o, 1),
                                           tnn.BatchNorm2d(o))

    def forward(self, x):
        return torch.nn.functional.relu(self.conv_block(x) + self.shortcut(x))


class TorchResUNet(tnn.Module):
    """ref:14:117-186."""

    def __init__(self):
        super().__init__()
        self.enc1 = tnn.Sequential(tnn.Conv2d(3, 64, 3, padding=1),
                                   tnn.PReLU())
        self.res1 = TorchResBlock(64, 64)
        self.pool1 = tnn.MaxPool2d(2, 2)
        self.res2 = TorchResBlock(64, 128)
        self.pool2 = tnn.MaxPool2d(2, 2)
        self.res3 = TorchResBlock(128, 256)
        self.pool3 = tnn.MaxPool2d(2, 2)
        self.bottleneck = tnn.Sequential(
            TorchResBlock(256, 512), TorchResBlock(512, 512),
            TorchResBlock(512, 256))
        self.up3 = tnn.ConvTranspose2d(256, 128, 2, stride=2)
        self.dec3 = TorchResBlock(256 + 128, 128)
        self.up2 = tnn.ConvTranspose2d(128, 64, 2, stride=2)
        self.dec2 = TorchResBlock(128 + 64, 64)
        self.up1 = tnn.ConvTranspose2d(64, 64, 2, stride=2)
        self.dec1 = TorchResBlock(64 + 64, 64)
        self.final = tnn.Conv2d(64, 3, 1)

    def forward(self, x):
        r1 = self.res1(self.enc1(x))
        r2 = self.res2(self.pool1(r1))
        r3 = self.res3(self.pool2(r2))
        b = self.bottleneck(self.pool3(r3))
        d3 = self.dec3(torch.cat((self.up3(b), r3), dim=1))
        d2 = self.dec2(torch.cat((self.up2(d3), r2), dim=1))
        d1 = self.dec1(torch.cat((self.up1(d2), r1), dim=1))
        return self.final(d1)


def make_torch_vgg16(num_classes=43, flat=512 * 7 * 7):
    """torchvision vgg16('D') structure (ref:05:47-56), random init.
    ``flat`` = 512 * (input_size/32)^2 for non-224 inputs."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.ReLU(True)]
            in_c = v
    features = tnn.Sequential(*layers)
    classifier = tnn.Sequential(
        tnn.Linear(flat, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, num_classes))

    class V(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.classifier = classifier

        def forward(self, x):
            h = self.features(x)
            return self.classifier(torch.flatten(h, 1))

    return V()


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


# ------------------------------------------------------------------- tests

def test_simple_unet_parity(rng):
    tmodel = TorchSimpleUNet().eval()
    variables = checkpoint.simple_unet_from_pth(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(nchw(x)).numpy()
    ours = np.asarray(SimpleUNet(precision=HI).apply(variables, x))
    ours_nchw = np.transpose(ours, (0, 3, 1, 2))
    assert np.allclose(ours_nchw, ref, atol=2e-5), (
        np.abs(ours_nchw - ref).max())


def test_simple_unet_pth_roundtrip(rng):
    tmodel = TorchSimpleUNet().eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = checkpoint.simple_unet_from_pth(sd)
    back = checkpoint.simple_unet_to_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        assert np.allclose(back[k], sd[k]), k


def test_resunet_parity(rng):
    tmodel = TorchResUNet().eval()
    variables = checkpoint.resunet_from_pth(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(nchw(x)).numpy()
    ours = np.asarray(ResUNet(precision=HI).apply(variables, x, train=False))
    ours_nchw = np.transpose(ours, (0, 3, 1, 2))
    assert np.allclose(ours_nchw, ref, atol=5e-5), (
        np.abs(ours_nchw - ref).max())


@pytest.mark.slow
def test_vgg16_parity(rng):
    tmodel = make_torch_vgg16().eval()
    variables = checkpoint.vgg16_from_pth(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    x = rng.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(nchw(x)).numpy()
    ours = np.asarray(VGG16(precision=HI).apply(variables, x))
    assert np.allclose(ours, ref, atol=2e-3), np.abs(ours - ref).max()

    # feature-tap parity: torch features[:16] output == tap_layer=15
    with torch.no_grad():
        tslice = tmodel.features[:16](nchw(x)).numpy()
    tap = np.asarray(VGG16(precision=HI).apply(variables, x, tap_layer=15))
    tap_nchw = np.transpose(tap, (0, 3, 1, 2))
    assert np.allclose(tap_nchw, tslice, atol=2e-3), (
        np.abs(tap_nchw - tslice).max())

    # GAP feature parity: torch model.features output == tap_layer=30
    with torch.no_grad():
        tfeat = tmodel.features(nchw(x)).numpy()
    tap30 = np.asarray(VGG16(precision=HI).apply(variables, x, tap_layer=30))
    assert np.allclose(np.transpose(tap30, (0, 3, 1, 2)), tfeat, atol=2e-3)


def test_vgg16_pth_roundtrip():
    tmodel = make_torch_vgg16().eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = checkpoint.vgg16_from_pth(sd)
    back = checkpoint.vgg16_to_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        assert np.allclose(back[k], sd[k]), k
