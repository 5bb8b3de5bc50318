"""End-to-end pipeline parity: identical weights through the .pth
converters, identical inputs — the torch reference-style pipeline
(restore -> clamp -> PNG-quantize -> normalize -> classify, ref:08+06)
must produce the same predictions as our fused eval graph."""

import numpy as np
import torch
import torch.nn as tnn

from tsr_tpu import checkpoint, eval as tsr_eval
from tsr_tpu.data import synthetic
from tsr_tpu.models import SimpleUNet, VGG16

from test_torch_parity import TorchSimpleUNet, make_torch_vgg16  # noqa: E402

SIZE = 32  # VGG pools /32 -> 1x1x512 flatten


def test_fused_eval_matches_torch_pipeline():
    torch.manual_seed(1)
    t_unet = TorchSimpleUNet().eval()
    t_vgg = make_torch_vgg16(num_classes=43, flat=512).eval()

    uv = checkpoint.simple_unet_from_pth(
        {k: v.numpy() for k, v in t_unet.state_dict().items()})
    jv = checkpoint.vgg16_from_pth(
        {k: v.numpy() for k, v in t_vgg.state_dict().items()})

    imgs, labels = synthetic.make_dataset(num_classes=8, per_class=4,
                                          size=SIZE, seed=3)

    # --- torch reference-style pipeline ---
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(
        np.transpose(imgs, (0, 3, 1, 2)).copy()).float() / 255.0
    with torch.no_grad():
        r = torch.clamp(t_unet(x), 0, 1)
        r = torch.trunc(r * 255.0) / 255.0  # PNG round trip (ref:08:98)
        logits_t = t_vgg((r - mean) / std).numpy()

    # --- our fused graph ---
    import jax

    hi = jax.lax.Precision.HIGHEST
    unet = SimpleUNet(precision=hi)
    judge = VGG16(num_classes=43, precision=hi)
    step = tsr_eval.make_fused_eval_step(unet.apply, judge.apply,
                                         quantize=True)
    out = step(uv, jv, imgs, labels, None)

    pred_t = np.argmax(logits_t, -1)
    pred_j = np.asarray(out["pred"])
    agree = (pred_t == pred_j).mean()
    assert agree == 1.0, (agree, pred_t, pred_j)
