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
