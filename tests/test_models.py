"""Shape / dtype / gradient / jit sanity for the Flax models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsr_tpu.models import ResUNet, SimpleUNet, VGG16


def test_simple_unet_shapes():
    m = SimpleUNet(widths=(8, 16))
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 32, 32, 3) and y.dtype == jnp.float32


def test_simple_unet_bf16_compute():
    m = SimpleUNet(widths=(8, 16), dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # params stay fp32, output returns fp32
    assert v["params"]["enc1"]["conv1"]["kernel"].dtype == jnp.float32
    assert m.apply(v, x).dtype == jnp.float32


def test_simple_unet_grads():
    m = SimpleUNet(widths=(4, 8))
    x = jnp.ones((1, 16, 16, 3), jnp.float32) * 0.5
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    norms = jax.tree.map(lambda a: float(jnp.abs(a).sum()), g)
    total = sum(jax.tree.leaves(norms))
    assert np.isfinite(total) and total > 0


def test_resunet_shapes_and_batchstats():
    m = ResUNet(widths=(4, 8, 16), bottleneck_width=32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in v
    y, new_vars = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 3)
    y_eval = m.apply(v, x, train=False)
    assert y_eval.shape == (2, 32, 32, 3)


def test_resunet_rejects_bad_spatial():
    m = ResUNet(widths=(4, 8, 16), bottleneck_width=32)
    with pytest.raises(AssertionError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 30, 3)), train=True)


def test_vgg_taps_and_logits():
    m = VGG16(num_classes=43)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(v, x)
    assert logits.shape == (1, 43)
    # relu1_2 tap (ref:11:93): full-res, 64ch
    tap2 = m.apply(v, x, tap_layer=2)
    assert tap2.shape == (1, 64, 64, 64)
    # features end (ref:12:37-44): /32 res, 512ch
    tap30 = m.apply(v, x, tap_layer=30)
    assert tap30.shape == (1, 2, 2, 512)
    logits2, feats = m.apply(v, x, return_features=True)
    assert feats.shape == (1, 2, 2, 512)
    assert np.allclose(np.asarray(logits), np.asarray(logits2))


def test_vgg_tap_index_bn_translation():
    """tap_index maps plain-vgg16 (reference) indices to the bn variant.

    torchvision vgg16_bn interleaves a BatchNorm after every conv, so the
    reference tap constants (2/15/30) address different layers there;
    using them raw on a bn judge silently taps the wrong layer."""
    from tsr_tpu.models.vgg import GAP_TAP, HIDDEN_STATE_TAP, PERCEPTUAL_TAP

    plain = VGG16(num_classes=5)
    # identity without batchnorm
    for k in (0, HIDDEN_STATE_TAP, PERCEPTUAL_TAP, GAP_TAP):
        assert plain.tap_index(k) == k

    bn = VGG16(num_classes=5, use_batchnorm=True)
    # hand-computed against torchvision vgg16_bn's features indexing:
    # conv1_1 0->0, conv1_2 2->3, relu3_3 15->22, final pool 30->43
    assert bn.tap_index(0) == 0
    assert bn.tap_index(HIDDEN_STATE_TAP) == 3
    assert bn.tap_index(PERCEPTUAL_TAP) == 22
    assert bn.tap_index(GAP_TAP) == 43
    with pytest.raises(ValueError):
        bn.tap_index(99)

    # functional: the translated GAP tap is the final pool ([/32 res]);
    # the raw plain index on the bn variant lands mid-block-4 instead
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x)
    good = bn.apply(v, x, tap_layer=bn.tap_index(GAP_TAP))
    assert good.shape == (1, 2, 2, 512)
    wrong = bn.apply(v, x, tap_layer=GAP_TAP)
    assert wrong.shape != good.shape


def test_vgg_dropout_train_mode():
    m = VGG16(num_classes=5, cfg=(8, "M", 16, "M"), fc_width=32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    a = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    b = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_simple_unet_input_minmax():
    """input_minmax == per-image min-max stretch then the plain net: same
    params, and the stretch makes the net invariant to global affine
    input maps (the fog family, ref:04:28)."""
    import jax

    from tsr_tpu.models.unet import SimpleUNet

    plain = SimpleUNet(widths=(4, 8))
    normed = SimpleUNet(widths=(4, 8), input_minmax=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    v = plain.init(jax.random.PRNGKey(1), x)

    ax = (1, 2, 3)
    lo = x.min(axis=ax, keepdims=True)
    hi = x.max(axis=ax, keepdims=True)
    manual = plain.apply(v, (x - lo) / (hi - lo))
    np.testing.assert_allclose(np.asarray(normed.apply(v, x)),
                               np.asarray(manual), atol=1e-6)
    # affine-invariance: a fogged input (t=0.3, A=0.9) maps to the same
    # output as the clean input when both span the full stretch range
    fogged = x * 0.3 + 0.9 * 0.7
    np.testing.assert_allclose(np.asarray(normed.apply(v, fogged)),
                               np.asarray(normed.apply(v, x)), atol=1e-4)
