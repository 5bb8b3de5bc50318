"""Fused restore->classify eval, PSNR/SSIM plumbing, report formatting."""

import jax
import jax.numpy as jnp
import numpy as np

from tsr_tpu import eval as tsr_eval
from tsr_tpu.data import synthetic
from tsr_tpu.models import SimpleUNet, VGG16
from tsr_tpu.utils import reporting

TINY_CFG = (8, "M", 16, "M")


def _models(size=32, ncls=4):
    judge = VGG16(num_classes=ncls, cfg=TINY_CFG, fc_width=32)
    jv = judge.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, size, size, 3)))
    unet = SimpleUNet(widths=(4, 8))
    uv = unet.init(jax.random.PRNGKey(1), jnp.zeros((1, size, size, 3)))
    return judge, jv, unet, uv


def test_fused_eval_step_classify_only():
    judge, jv, _, _ = _models()
    imgs, labels = synthetic.make_dataset(4, 3, 32)
    step = tsr_eval.make_fused_eval_step(None, judge.apply)
    out = step(None, jv, imgs, labels, None)
    assert out["pred"].shape == (12,)
    assert 0 <= int(out["correct"]) <= 12


def test_fused_eval_step_with_restorer_and_metrics():
    judge, jv, unet, uv = _models()
    imgs, labels = synthetic.make_dataset(4, 3, 32)
    step = tsr_eval.make_fused_eval_step(
        unet.apply, judge.apply, with_metrics=True)
    out = step(uv, jv, imgs, labels, imgs)
    assert "psnr" in out and out["psnr"].shape == (12,)
    assert "ssim" in out and np.isfinite(np.asarray(out["ssim"])).all()


def test_evaluate_batches_aggregation():
    judge, jv, _, _ = _models()
    imgs, labels = synthetic.make_dataset(4, 4, 32)
    step = tsr_eval.make_fused_eval_step(None, judge.apply)

    def it():
        for s in range(0, 16, 8):
            yield imgs[s:s + 8], labels[s:s + 8]

    res = tsr_eval.evaluate_batches(step, None, jv, it())
    assert res["n"] == 16 and 0.0 <= res["top1"] <= 1.0


def test_quantize_matches_png_roundtrip():
    """restore_batch(quantize=True) must equal save-as-uint8 + reload."""
    unet, uv = _models()[2:]
    x = np.random.default_rng(0).uniform(
        0, 1, (2, 32, 32, 3)).astype(np.float32)
    out = tsr_eval.restore_batch(unet.apply, uv, x, quantize=True)
    out = np.asarray(out)
    # simulate the reference's disk round trip (ref:08:96-98); the
    # quantizer uses scale255's near-integer snapping, so allow 1 level
    raw = np.asarray(tsr_eval.restore_batch(unet.apply, uv, x,
                                            quantize=False))
    u8 = np.trunc(raw * 255.0).astype(np.uint8)
    diff = np.abs(out * 255.0 - u8.astype(np.float32))
    assert diff.max() <= 1.0
    # quantized values are exact multiples of 1/255
    assert np.allclose(out * 255.0, np.round(out * 255.0), atol=1e-4)


def test_reports():
    s = reporting.accuracy_report({"Clean": 0.9996, "Noisy": 0.2682},
                                  "Final Test Report")
    assert "99.96%" in s and "26.82%" in s
    m = reporting.metric_report(
        {"Noise": {"psnr": 25.1, "ssim": 0.89}}, "Quality")
    assert "25.1" in m


def test_evaluate_directory_device_resize(tmp_path):
    """resize='device' (native upload + on-device resize) matches the host
    harness: same n, same top-1 under a smooth judge (1-LSB input deltas
    cannot flip a well-separated argmax)."""
    import jax

    from tsr_tpu import eval as tsr_eval
    from tsr_tpu.data import synthetic

    root = tmp_path / "tree"
    synthetic.write_image_tree(str(root), num_classes=3, per_class=6,
                               size=20, seed=2, size_jitter=0.3)

    # smooth deterministic "judge": fixed projection of channel means
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3))

    def judge_apply(vars_, x01, train=False):
        feats = jnp.mean(x01, axis=(1, 2))  # [B,3]
        return feats @ vars_["w"]

    jv = {"w": w}
    host = tsr_eval.evaluate_directory(judge_apply, jv, str(root),
                                       batch_size=4, size=32,
                                       resize="host")
    dev = tsr_eval.evaluate_directory(judge_apply, jv, str(root),
                                      batch_size=4, size=32,
                                      resize="device")
    assert host["n"] == dev["n"] == 18
    assert host["top1"] == dev["top1"]
    assert abs(host["confidence"] - dev["confidence"]) < 1e-3
