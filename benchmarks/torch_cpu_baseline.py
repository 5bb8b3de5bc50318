"""Measure the reference pipeline's throughput on CPU torch.

Implements the reference architectures (ResUNet ref:14:96-186 + VGG16 judge
ref:05:47-56) in torch and times the restore->classify chain the way the
reference runs it (ref:17:73-99 batched restore + ref:06:49-55 classify),
at the reference resolution (224). The result is stored in
``cpu_baseline.json`` and used by ``bench.py`` as the ``vs_baseline``
denominator (BASELINE.json: ">=10x CPU-reference images/sec").

Run once: ``python benchmarks/torch_cpu_baseline.py``.
"""

import json
import os
import time

import numpy as np
import torch
import torch.nn as nn

torch.manual_seed(0)


class ResidualBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.Conv2d(i, o, 3, padding=1), nn.BatchNorm2d(o), nn.PReLU(),
            nn.Conv2d(o, o, 3, padding=1), nn.BatchNorm2d(o))
        self.shortcut = nn.Sequential()
        if i != o:
            self.shortcut = nn.Sequential(nn.Conv2d(i, o, 1),
                                          nn.BatchNorm2d(o))

    def forward(self, x):
        return torch.nn.functional.relu(self.conv_block(x) + self.shortcut(x))


class ResUNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.enc1 = nn.Sequential(nn.Conv2d(3, 64, 3, padding=1), nn.PReLU())
        self.res1 = ResidualBlock(64, 64)
        self.pool1 = nn.MaxPool2d(2, 2)
        self.res2 = ResidualBlock(64, 128)
        self.pool2 = nn.MaxPool2d(2, 2)
        self.res3 = ResidualBlock(128, 256)
        self.pool3 = nn.MaxPool2d(2, 2)
        self.bottleneck = nn.Sequential(
            ResidualBlock(256, 512), ResidualBlock(512, 512),
            ResidualBlock(512, 256))
        self.up3 = nn.ConvTranspose2d(256, 128, 2, stride=2)
        self.dec3 = ResidualBlock(384, 128)
        self.up2 = nn.ConvTranspose2d(128, 64, 2, stride=2)
        self.dec2 = ResidualBlock(192, 64)
        self.up1 = nn.ConvTranspose2d(64, 64, 2, stride=2)
        self.dec1 = ResidualBlock(128, 64)
        self.final = nn.Conv2d(64, 3, 1)

    def forward(self, x):
        r1 = self.res1(self.enc1(x))
        r2 = self.res2(self.pool1(r1))
        r3 = self.res3(self.pool2(r2))
        b = self.bottleneck(self.pool3(r3))
        d3 = self.dec3(torch.cat((self.up3(b), r3), dim=1))
        d2 = self.dec2(torch.cat((self.up2(d3), r2), dim=1))
        d1 = self.dec1(torch.cat((self.up1(d2), r1), dim=1))
        return self.final(d1)


def make_vgg16(num_classes=43):
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU(True)]
            in_c = v
    features = nn.Sequential(*layers)
    classifier = nn.Sequential(
        nn.Linear(25088, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, num_classes))

    class V(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.classifier = classifier

        def forward(self, x):
            return self.classifier(torch.flatten(self.features(x), 1))

    return V()


def main(batch: int = 32, n_batches: int = 4, size: int = 224):
    restorer = ResUNet().eval()
    judge = make_vgg16().eval()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(
        np.random.randint(0, 256, (batch, 3, size, size), dtype=np.uint8))

    def run_once():
        with torch.no_grad():
            f = x.float() / 255.0
            r = torch.clamp(restorer(f), 0, 1)
            r = torch.trunc(r * 255.0) / 255.0  # PNG round-trip (ref:08:98)
            logits = judge((r - mean) / std)
            return torch.argmax(logits, 1)

    run_once()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_batches):
        run_once()
    dt = time.perf_counter() - t0
    ips = batch * n_batches / dt
    out = {
        "images_per_sec": ips,
        "batch": batch,
        "size": size,
        "torch_threads": torch.get_num_threads(),
        "pipeline": "restore(ResUNet)->quantize->classify(VGG16)",
        "device": "cpu",
    }
    path = os.path.join(os.path.dirname(__file__), "cpu_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
