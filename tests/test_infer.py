"""Pipelined restore_tree: files written, metrics computed, parity with a
direct (unpipelined) pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsr_tpu import infer
from tsr_tpu.data import gtsrb, synthetic
from tsr_tpu.models import SimpleUNet


@pytest.fixture(scope="module")
def trees(tmp_path_factory):
    root = tmp_path_factory.mktemp("rt")
    clean = root / "clean"
    synthetic.write_image_tree(str(clean), num_classes=3, per_class=5,
                               size=32, seed=0)
    # distorted twin: same tree, shifted pixels
    import cv2

    distorted = root / "distorted"
    for p in clean.glob("*/*.ppm"):
        img = cv2.imread(str(p))
        out = distorted / p.relative_to(clean)
        out.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out), np.clip(img.astype(int) + 30, 0, 255
                                      ).astype(np.uint8))
    return clean, distorted, root


def test_restore_tree_pipelined(trees):
    clean, distorted, root = trees
    unet = SimpleUNet(widths=(4, 8))
    v = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    logs = []
    res = infer.restore_tree(
        unet.apply, v, str(distorted), str(root / "restored"),
        clean_dir=str(clean), batch_size=4, size=32, log=logs.append)
    assert res["images"] == 15
    outs = sorted((root / "restored").glob("*/*.png"))
    assert len(outs) == 15
    assert "psnr" in res and "ssim" in res
    assert np.isfinite(res["psnr"]) and 0 <= res["ssim"] <= 1

    # parity with a direct single-batch pass over the same files
    step = infer.make_restore_step(unet.apply, False)
    files = sorted(distorted.glob("*/*.ppm"))
    imgs = np.stack([gtsrb._decode_resize(str(p), 32) for p in files])
    want = np.asarray(step(v, imgs))
    import cv2

    for i, p in enumerate(files):
        got = cv2.imread(str(
            (root / "restored" / p.relative_to(distorted)
             ).with_suffix(".png")))[:, :, ::-1]
        np.testing.assert_array_equal(got, want[i])


def test_restore_tree_missing_clean(trees):
    clean, distorted, root = trees
    unet = SimpleUNet(widths=(4, 8))
    v = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    res = infer.restore_tree(
        unet.apply, v, str(distorted), str(root / "restored2"),
        clean_dir=str(root / "nonexistent"), batch_size=8, size=32,
        log=lambda s: None)
    assert res["images"] == 15
    assert "psnr" not in res  # no clean twins -> no metrics


def test_host_metrics_match_device():
    """ops.image_host PSNR/SSIM (used by restore_tree's worker pool so the
    clean tree never crosses the host->device link) must match the
    on-device ops.image versions."""
    from tsr_tpu.ops import image as image_ops
    from tsr_tpu.ops import image_host

    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-40, 40, a.shape), 0,
                255).astype(np.uint8)
    np.testing.assert_allclose(
        image_host.psnr(a, b),
        np.asarray(image_ops.psnr(a.astype(np.float32),
                                  b.astype(np.float32))), rtol=1e-5)
    np.testing.assert_allclose(
        image_host.ssim(a, b), np.asarray(image_ops.ssim(a, b)),
        rtol=1e-4, atol=1e-5)
    # identical images: PSNR inf on both paths, SSIM 1
    assert np.isinf(image_host.psnr(a, a)).all()
    np.testing.assert_allclose(image_host.ssim(a, a), 1.0, atol=1e-6)


def test_resize_from_padded_matches_cv2():
    """Device bilinear resize (traced native sizes, MXU matmul form) vs
    cv2.INTER_LINEAR: within 1 LSB (cv2 quantizes its coefficients to
    fixed point; PARITY.md 'Resize parity')."""
    import cv2

    from tsr_tpu.ops import image as image_ops

    rng = np.random.default_rng(7)
    out_size = 64
    cases = [(17, 23), (40, 40), (9, 31), (48, 20), (80, 100)]  # up & down
    pad = 128
    padded = np.zeros((len(cases), pad, pad, 3), np.uint8)
    sizes = np.zeros((len(cases), 2), np.int32)
    refs = []
    for j, (h, w) in enumerate(cases):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        padded[j, :h, :w] = img
        sizes[j] = (h, w)
        refs.append(cv2.resize(img, (out_size, out_size),
                               interpolation=cv2.INTER_LINEAR))
    got = np.asarray(image_ops.resize_from_padded(
        jnp.asarray(padded), jnp.asarray(sizes), out_size))
    for j, ref in enumerate(refs):
        d = np.abs(got[j].astype(int) - ref.astype(int))
        assert d.max() <= 1, (cases[j], d.max())
        # cv2 quantizes bilinear coefficients to fixed point; measured
        # ~12% of pixels land 1 LSB apart from exact float weights
        assert (d > 0).mean() < 0.25, (cases[j], (d > 0).mean())
    # identity: native == out -> bit-exact passthrough
    img = rng.integers(0, 256, (out_size, out_size, 3), dtype=np.uint8)
    got = np.asarray(image_ops.resize_from_padded(
        jnp.asarray(img[None]), jnp.asarray([[out_size, out_size]],
                                            np.int32), out_size))
    np.testing.assert_array_equal(got[0], img)


@pytest.fixture(scope="module")
def native_trees(tmp_path_factory):
    """Trees whose natives are SMALLER than the target size, so the
    device-resize path genuinely upscales on device."""
    from tsr_tpu.data import synthetic

    root = tmp_path_factory.mktemp("rt_native")
    clean = root / "clean"
    synthetic.write_image_tree(str(clean), num_classes=3, per_class=5,
                               size=20, seed=1, size_jitter=0.3)
    import cv2

    distorted = root / "distorted"
    rng = np.random.default_rng(3)
    for p in clean.glob("*/*.ppm"):
        img = cv2.imread(str(p))
        noisy = np.clip(img.astype(int)
                        + rng.integers(-25, 25, img.shape), 0,
                        255).astype(np.uint8)
        out = distorted / p.relative_to(clean)
        out.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out), noisy)
    return clean, distorted, root


def test_restore_tree_device_resize(native_trees):
    """Device-resize mode writes the same tree as host mode, with outputs
    and metrics within the documented <=1 LSB resize delta."""
    import cv2

    clean, distorted, root = native_trees
    unet = SimpleUNet(widths=(4, 8))
    v = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    res_dev = infer.restore_tree(
        unet.apply, v, str(distorted), str(root / "out_dev"),
        clean_dir=str(clean), batch_size=4, size=32, resize="device",
        log=lambda s: None)
    res_host = infer.restore_tree(
        unet.apply, v, str(distorted), str(root / "out_host"),
        clean_dir=str(clean), batch_size=4, size=32, resize="host",
        log=lambda s: None)
    assert res_dev["images"] == res_host["images"] == 15
    dev_files = sorted((root / "out_dev").glob("*/*.png"))
    host_files = sorted((root / "out_host").glob("*/*.png"))
    assert [f.name for f in dev_files] == [f.name for f in host_files]
    deltas = []
    for df, hf in zip(dev_files, host_files):
        a = cv2.imread(str(df)).astype(np.float32)
        b = cv2.imread(str(hf)).astype(np.float32)
        deltas.append(np.abs(a - b).mean())
    # 1-LSB input deltas through a random conv net stay small at output
    assert np.mean(deltas) < 2.0, deltas
    assert abs(res_dev["psnr"] - res_host["psnr"]) < 0.5
    assert abs(res_dev["ssim"] - res_host["ssim"]) < 0.01
