"""Native C++ IO tier: build, decode, resize parity with cv2, throughput."""

import numpy as np
import pytest

from tsr_tpu import native
from tsr_tpu.data import gtsrb, synthetic


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tree")
    synthetic.write_image_tree(str(root), num_classes=3, per_class=4,
                               size=48, seed=1)
    return root


def test_builds():
    assert native.available(), "g++ build of libtsrio failed"


def test_decode_matches_cv2(tree):
    import cv2

    p = sorted(tree.glob("*/*.ppm"))[0]
    ours = native.decode(str(p))
    ref = cv2.imread(str(p))[:, :, ::-1]
    assert ours.shape == ref.shape
    assert (ours == ref).all()


def test_batch_resize_matches_cv2(tree):
    import cv2

    paths = [str(p) for p in sorted(tree.glob("*/*.ppm"))[:6]]
    ours = native.load_batch(paths, 32, threads=4)
    assert ours.shape == (6, 32, 32, 3)
    for i, p in enumerate(paths):
        ref = cv2.resize(cv2.imread(p), (32, 32),
                         interpolation=cv2.INTER_LINEAR)[:, :, ::-1]
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        # cv2 uses fixed-point bilinear; allow 1-level rounding skew
        assert diff.max() <= 1, (p, diff.max())


def test_image_folder_uses_native_path(tree):
    ds = gtsrb.ImageFolder(str(tree), size=32)
    imgs, labels = ds.load_batch(np.arange(4))
    assert imgs.shape == (4, 32, 32, 3)
    # must agree with the per-item cv2 path
    for k in range(4):
        ref, lab = ds.load(k)
        assert labels[k] == lab
        assert np.abs(imgs[k].astype(int) - ref.astype(int)).max() <= 1


def test_missing_file_raises(tree):
    with pytest.raises(RuntimeError):
        native.load_batch([str(tree / "nope.ppm")], 32)


def test_write_png_batch_lossless(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (5, 32, 32, 3), np.uint8)
    paths = [str(tmp_path / f"i{k}.png") for k in range(5)]
    native.write_png_batch(paths, imgs, threads=2)
    import cv2

    for p, img in zip(paths, imgs):
        back = cv2.imread(p)[:, :, ::-1]
        np.testing.assert_array_equal(back, img)


def test_write_png_batch_bad_dir_raises(tmp_path):
    with pytest.raises(RuntimeError):
        native.write_png_batch([str(tmp_path / "no" / "dir" / "x.png")],
                               np.zeros((1, 8, 8, 3), np.uint8))


def test_png_decode_matches_cv2(tmp_path):
    """Native PNG decode parity vs cv2 across encoders and filter choices."""
    import cv2

    rng = np.random.RandomState(3)
    # gradient-ish content so cv2's encoder exercises Sub/Up/Avg/Paeth
    # filters, plus pure noise (filter None wins there)
    ramp = (np.arange(40)[:, None, None] * 5
            + np.arange(56)[None, :, None] * 3
            + np.arange(3)[None, None, :] * 7).astype(np.uint8)
    noise = rng.randint(0, 256, (33, 47, 3), np.uint8)
    for name, img in (("ramp", ramp), ("noise", noise)):
        for level in (0, 1, 6, 9):
            p = str(tmp_path / f"{name}_{level}.png")
            cv2.imwrite(p, img[:, :, ::-1],
                        [cv2.IMWRITE_PNG_COMPRESSION, level])
            ours = native.decode(p)
            np.testing.assert_array_equal(ours, img, err_msg=p)


def test_png_decode_color_types(tmp_path):
    """Gray (type 0), palette (3) and RGBA (6) PNGs decode to cv2-equal RGB."""
    import cv2
    from PIL import Image

    rng = np.random.RandomState(4)
    gray = rng.randint(0, 256, (21, 30), np.uint8)
    p = str(tmp_path / "gray.png")
    cv2.imwrite(p, gray)
    ref = cv2.imread(p)[:, :, ::-1]  # cv2 replicates gray into RGB
    np.testing.assert_array_equal(native.decode(p), ref)

    rgba = rng.randint(0, 256, (18, 25, 4), np.uint8)
    p = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, "RGBA").save(p)
    np.testing.assert_array_equal(native.decode(p), rgba[:, :, :3])

    pal = Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE, colors=64)
    p = str(tmp_path / "pal.png")
    pal.save(p)
    np.testing.assert_array_equal(native.decode(p),
                                  np.asarray(pal.convert("RGB")))


def test_load_batch_png_tree(tmp_path):
    """load_batch on a .png tree (the restored-tree hot path, ref:09:15-26)."""
    import cv2

    rng = np.random.RandomState(5)
    paths = []
    imgs = []
    for k in range(6):
        img = rng.randint(0, 256, (30 + k, 40 + k, 3), np.uint8)
        p = str(tmp_path / f"i{k}.png")
        cv2.imwrite(p, img[:, :, ::-1])
        paths.append(p)
        imgs.append(img)
    ours = native.load_batch(paths, 32, threads=3)
    for i, img in enumerate(imgs):
        ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, (paths[i], diff.max())
