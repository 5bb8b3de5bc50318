"""Offline tree generation: file->file parity with the reference layout."""

from pathlib import Path

import numpy as np
import pytest

from tsr_tpu import offline
from tsr_tpu.data import gtsrb, synthetic


@pytest.fixture(scope="module")
def clean_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("clean")
    synthetic.write_image_tree(str(root), num_classes=3, per_class=2,
                               size=40, seed=0)
    return root


def test_generate_noise_tree(clean_tree, tmp_path):
    dst = tmp_path / "Noise"
    n = offline.generate_tree(str(clean_tree), str(dst), "noise")
    assert n == 6
    # layout mirrored, .ppm kept (ref:02:47-54)
    outs = sorted(dst.glob("*/*.ppm"))
    assert len(outs) == 6
    # noise actually applied
    src = sorted(Path(clean_tree).glob("*/*.ppm"))[0]
    ds = gtsrb.PairedFolder(str(clean_tree), str(dst), size=40)
    bad, clean = ds.load(0)
    assert not np.array_equal(bad, clean)


def test_generate_compound_tree_png(clean_tree, tmp_path):
    dst = tmp_path / "Compound"
    n = offline.generate_tree(str(clean_tree), str(dst), "compound")
    assert n == 6
    # compound saves .png (ref:16:55)
    assert len(sorted(dst.glob("*/*.png"))) == 6
    # pairing falls back to .png (ref:07:51-52)
    ds = gtsrb.PairedFolder(str(clean_tree), str(dst), size=40)
    assert len(ds) == 6


def test_bucketed_blur_tree_matches_native(clean_tree, tmp_path):
    """The blur tree (bucket pad -> batched blur -> crop -> per-image
    min-max, ref:03:29) must equal per-image native-size processing."""
    import cv2

    from tsr_tpu.ops import distortions

    dst = tmp_path / "Blur"
    offline.generate_tree(str(clean_tree), str(dst), "blur")
    for src in sorted(Path(clean_tree).glob("*/*.ppm")):
        img = np.ascontiguousarray(cv2.imread(str(src))[:, :, ::-1])
        native = np.asarray(distortions.apply_motion_blur(img, 12, 45,
                                                          minmax_normalize=True))
        got = cv2.imread(str(dst / src.relative_to(clean_tree)))[:, :, ::-1]
        diff = np.abs(got.astype(int) - native.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 1e-3  # cvRound ties at most


def test_image_folder_and_batches(clean_tree):
    ds = gtsrb.ImageFolder(str(clean_tree), size=32)
    assert len(ds.classes) == 3 and len(ds) == 6
    batches = list(gtsrb.batches(ds, batch_size=4, shuffle=True, seed=0,
                                 drop_remainder=False, epochs=1))
    n = sum(len(b[1]) for b in batches)
    assert n == 6
    imgs, labels = batches[0]
    assert imgs.shape[1:] == (32, 32, 3) and imgs.dtype == np.uint8


def test_batches_producer_error_propagates(clean_tree):
    """A decode/transform failure in the prefetch producer thread must
    re-raise in the consumer, not hang it forever on q.get() (the failure
    mode that would silently wedge a multi-hour unattended run)."""
    ds = gtsrb.ImageFolder(str(clean_tree), size=32)

    def bad_transform(item):
        raise RuntimeError("boom in producer")

    it = gtsrb.batches(ds, batch_size=4, epochs=1, transform=bad_transform)
    with pytest.raises(RuntimeError, match="boom in producer"):
        next(it)

    # and a missing file (decode error) propagates the same way
    ds2 = gtsrb.ImageFolder(str(clean_tree), size=32)
    ds2.samples[0] = (str(clean_tree / "nope" / "missing.ppm"),
                      ds2.samples[0][1])
    it2 = gtsrb.batches(ds2, batch_size=4, shuffle=False, epochs=1)
    with pytest.raises(Exception):
        next(it2)


def test_pad_reflect_degenerate_dims():
    """_pad_reflect must terminate on 1-pixel-wide/tall images (reflect
    padding of width dim-1 == 0 used to spin the tiling loop forever)."""
    from tsr_tpu import offline

    for shape in ((1, 5, 3), (5, 1, 3), (1, 1, 3)):
        img = np.full(shape, 7, np.uint8)
        out = offline._pad_reflect(img, 32, 32)
        assert out.shape == (32, 32, 3)
        assert (out == 7).all()  # edge-pad of a constant image


def test_pil_resize_backend(tmp_path):
    """--resize-backend pil gives exact PIL BILINEAR output (the
    reference's torchvision Resize semantics) and restores cleanly."""
    import cv2
    import numpy as np
    from PIL import Image

    from tsr_tpu.data import gtsrb

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (250, 250, 3), np.uint8)
    p = tmp_path / "c" / "x.ppm"
    p.parent.mkdir()
    cv2.imwrite(str(p), img[:, :, ::-1])
    try:
        gtsrb.set_resize_backend("pil")
        got = gtsrb._decode_resize(str(p), 224)
        want = np.asarray(Image.fromarray(img).resize((224, 224),
                                                      Image.BILINEAR))
        np.testing.assert_array_equal(got, want)
        batch = gtsrb._decode_resize_batch([str(p)], 224)
        np.testing.assert_array_equal(batch[0], want)
    finally:
        gtsrb.set_resize_backend("cv2")
    got_cv2 = gtsrb._decode_resize(str(p), 224)
    # Downscale: the two backends genuinely differ (PIL antialiases).
    assert np.abs(got_cv2.astype(int) - want.astype(int)).max() > 1


def test_small_native_tail(tmp_path):
    """CALIB['size_small_frac'] routes that share of tree images to the
    GTSRB-like small-crop range (docs/CALIBRATION.md r3 finding 8)."""
    import cv2

    old = dict(synthetic.CALIB)
    try:
        synthetic.CALIB["size_small_frac"] = 0.5
        synthetic.CALIB["size_small_range"] = (26.0, 40.0)
        root = tmp_path / "tail"
        synthetic.write_image_tree(str(root), num_classes=4, per_class=24,
                                   size=72, seed=3, size_jitter=0.45)
        sizes = np.array([cv2.imread(str(p)).shape[0]
                          for p in sorted(root.glob("*/*.ppm"))])
        small = ((sizes >= 26) & (sizes <= 40)).mean()
        # 48 Bernoulli(0.5) draws: [0.25, 0.75] is > 6 sigma
        assert 0.25 <= small <= 0.75, small
        # the large branch is untouched: sizes above 40 still span the
        # jitter range around 72
        assert sizes.max() > 80
    finally:
        synthetic.CALIB.clear()
        synthetic.CALIB.update(old)


def test_strength_jittered_kinds(clean_tree, tmp_path):
    """noise_rand/blur_rand/fog_rand draw per-image strengths: every tree
    generates, differs from clean, and shows strength *spread* across
    images (the fixed kinds would give near-identical degradation)."""
    for kind in ("noise_rand", "blur_rand", "fog_rand"):
        dst = tmp_path / kind
        n = offline.generate_tree(str(clean_tree), str(dst), kind, seed=3)
        assert n == 6
        ds = gtsrb.PairedFolder(str(clean_tree), str(dst), size=40)
        assert len(ds) == 6
        sev = []
        for i in range(len(ds)):
            bad, clean = ds.load(i)
            assert not np.array_equal(bad, clean)
            sev.append(np.abs(bad.astype(int) - clean.astype(int)).mean())
        # per-image severity varies (range > 20% of the mean)
        assert max(sev) - min(sev) > 0.2 * np.mean(sev), sev


def test_fog_rand_spans_mild_point(clean_tree, tmp_path):
    """The jittered fog range reaches near-clear images (t ~ 0.9, the
    ref:13:51 mild point) — the fixed ref:04 tree never goes above
    t=0.36, which is why severe-trained fog restorers over-correct mild
    inputs (RESULTS.md cascade A/B)."""
    dst = tmp_path / "FogRand"
    offline.generate_tree(str(clean_tree), str(dst), "fog_rand", seed=11)
    ds = gtsrb.PairedFolder(str(clean_tree), str(dst), size=40)
    errs = [np.abs(ds.load(i)[0].astype(int) - ds.load(i)[1].astype(int)
                   ).mean() for i in range(len(ds))]
    # with intensity U[0.05,0.85] over 6 draws, at least one image should
    # be mildly fogged (mean error well under half the severest draw)
    assert min(errs) < 0.5 * max(errs), errs


def test_distortion_marker_and_variant(clean_tree, tmp_path):
    """generate_tree drops a .distortion provenance marker; the cascade
    variant label (RESULTS.md A/B/B'/C) derives from restorer checkpoint
    configs built from it (scripts/_common.restorer_provenance)."""
    import json

    from tsr_tpu import pipeline

    dst = tmp_path / "Noise"
    offline.generate_tree(str(clean_tree), str(dst), "noise_rand")
    meta = json.loads((dst / ".distortion").read_text())
    assert meta["kind"] == "noise_rand" and meta["images"] == 6

    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from _common import restorer_provenance

    jit_cfg = restorer_provenance(str(dst), 0.25, False)
    assert jit_cfg == {"identity_frac": 0.25, "severity": "jittered"}
    # unmarked tree (real GTSRB / pre-r5): no severity key
    assert "severity" not in restorer_provenance(str(clean_tree), 0.0, True)

    severe = {"identity_frac": 0.25, "severity": "reference"}
    minmax = dict(severe, input_minmax=True)
    assert pipeline.cascade_variant(
        {"noise": jit_cfg, "fog": minmax, "blur": jit_cfg})[0] == "C"
    assert pipeline.cascade_variant(
        {"noise": severe, "fog": minmax, "blur": severe})[0] == "B'"
    assert pipeline.cascade_variant(
        {"noise": severe, "fog": severe, "blur": severe})[0] == "B"
    assert pipeline.cascade_variant(
        {t: {"identity_frac": 0.0} for t in ("noise", "fog", "blur")}
    )[0] == "A"
    assert pipeline.cascade_variant({t: {} for t in ("noise", "fog",
                                                     "blur")})[0] == "?"


def test_photo_degrade_knob():
    """CALIB['photo_degrade']=0 is a strict no-op; >0 perturbs the render
    (r5 compound-band A/B lever, docs/CALIBRATION.md)."""
    from tsr_tpu.data import synthetic

    a = synthetic.make_sign(5, 40, np.random.default_rng(3))
    old = synthetic.CALIB["photo_degrade"]
    try:
        synthetic.CALIB["photo_degrade"] = 0.0
        b = synthetic.make_sign(5, 40, np.random.default_rng(3))
        np.testing.assert_array_equal(a, b)
        synthetic.CALIB["photo_degrade"] = 1.0
        c = synthetic.make_sign(5, 40, np.random.default_rng(3))
    finally:
        synthetic.CALIB["photo_degrade"] = old
    d = np.abs(a.astype(int) - c.astype(int)).mean()
    assert d > 2.0, d
