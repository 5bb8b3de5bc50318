"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsr_tpu import configs
from tsr_tpu.kernels import distort


def test_fused_fog_noise_math(rng):
    imgs = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    t = np.asarray([0.6, 0.8, 1.0], np.float32)
    f, pre = distort.fused_fog_noise(
        imgs, 123,
        gate_fog=np.asarray([1, 1, 0], np.int32), t=t,
        gate_noise=np.asarray([0, 0, 0], np.int32),
        sigma=np.zeros(3, np.float32), interpret=True)
    f = np.asarray(f)
    pre = np.asarray(pre)
    for i, (gf, ti) in enumerate([(1, 0.6), (1, 0.8), (0, 1.0)]):
        ref = imgs[i] / 255.0
        if gf:
            ref = ref * ti + 0.9 * (1 - ti)
        assert np.allclose(f[i], ref, atol=1e-5), i
        assert np.allclose(pre[i],
                           np.clip(np.trunc(ref * 255.0 + 1e-4), 0, 255),
                           atol=1.0)


@pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="TPU interpreter returns zero PRNG bits; needs real TPU — run "
           "with TSR_TEST_TPU=1. Recorded pass on TPU v5e 2026-08-17 "
           "(tests/conftest.py escape hatch).")
def test_fused_noise_statistics(rng):
    imgs = np.full((2, 32, 32, 3), 128, np.uint8)
    sigma = np.asarray([0.1, 0.2], np.float32)
    f, _ = distort.fused_fog_noise(
        imgs, 7, gate_fog=np.zeros(2, np.int32),
        t=np.ones(2, np.float32), gate_noise=np.ones(2, np.int32),
        sigma=sigma, interpret=False)
    f = np.asarray(f)
    for i in range(2):
        d = f[i] - 128.0 / 255.0
        assert abs(d.mean()) < 0.02
        assert abs(d.std() - sigma[i]) < 0.02, (d.std(), sigma[i])


def test_pallas_random_mix_distribution_matches_jnp(rng):
    """Same gates/params (same key), noise streams differ: outputs must
    agree exactly on non-noise samples and statistically on noisy ones."""
    from tsr_tpu.ops import distortions

    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(3)
    ref = np.asarray(distortions.apply_random_distortions(imgs, key))
    ours = np.asarray(distort.apply_random_distortions_pallas(
        imgs, key, interpret=True))
    assert ours.shape == ref.shape and ours.dtype == ref.dtype

    # replicate the gate draws to find noise-free samples
    keys = jax.random.split(key, 8)
    gate_noise = np.asarray(
        jax.random.uniform(keys[3], (8, 1, 1, 1)) < 0.5).reshape(-1)
    for i in range(8):
        diff = np.abs(ours[i].astype(int) - ref[i].astype(int))
        if not gate_noise[i]:
            assert diff.max() <= 1, (i, diff.max())
        else:
            # distributional agreement only (different RNG streams; on CPU
            # the interpreter's PRNG is all-zeros, still zero-mean-close)
            assert abs(ours[i].mean() - ref[i].mean()) < 4.0, i


def test_sparse_blur_kernel_matches_dense(rng):
    """Tap-compacted blur (top_k over the rasterized line's nonzeros) must
    equal the MXU grouped-conv reference for per-sample kernels."""
    from tsr_tpu.kernels import blur_pallas
    from tsr_tpu.ops import blur as blur_ops

    imgs = rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    degs = jnp.asarray([5, 15])
    angs = jnp.asarray([30.0, 275.0])
    kerns = jax.vmap(
        lambda d, a: blur_ops.motion_blur_kernel(d, a, max_degree=15)
    )(degs, angs)
    # the default tap budget must cover every nonzero of the line kernel
    assert int((np.asarray(kerns) > 0).sum(axis=(1, 2)).max()) <= 3 * 15
    ref = np.asarray(blur_ops.filter2d(jnp.asarray(imgs), kerns))
    got = np.asarray(blur_pallas.filter2d_pallas_sparse(
        imgs, kerns, interpret=True))
    assert np.abs(got - ref).max() < 1e-3
