"""int8 post-training quantization: roundtrip, BN folding, fp parity,
and the eval-harness drop-in contract (tsr_tpu/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tsr_tpu import eval as tsr_eval
from tsr_tpu import quant
from tsr_tpu.data import synthetic
from tsr_tpu.models import VGG16

TINY_CFG = (8, "M", 16, "M")


def _logit_agreement(a, b):
    """(pearson corr over all logits, top-1 agreement fraction)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    top1 = float(np.mean(a.argmax(-1) == b.argmax(-1)))
    return corr, top1


def test_absmax_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 8, 16)).astype(np.float32))
    q, s = quant.absmax_quantize(w, axes=(0, 1, 2))
    assert q.dtype == jnp.int8 and s.shape == (16,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    # symmetric rounding: error <= half a quantization step per channel
    assert (err <= np.asarray(s)[None, None, None, :] * 0.5 + 1e-7).all()
    # every channel actually uses the full int8 range at its max
    assert int(np.abs(np.asarray(q)).max()) == 127


def test_int8_forward_matches_fp32():
    judge = VGG16(num_classes=7, cfg=TINY_CFG, fc_width=32)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -2, 2, (16, 32, 32, 3)).astype(np.float32))
    variables = judge.init(jax.random.PRNGKey(0), x[:1])
    ref = judge.apply(variables, x, train=False)
    apply_q, qvars = quant.quantized_judge(judge, variables)
    got = jax.jit(apply_q)(qvars, x)
    corr, top1 = _logit_agreement(ref, got)
    assert corr > 0.995, corr
    assert top1 >= 0.875, top1


def test_int8_forward_folds_batchnorm():
    judge = VGG16(num_classes=5, cfg=TINY_CFG, fc_width=32,
                  use_batchnorm=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-2, 2, (12, 32, 32, 3)).astype(np.float32))
    variables = judge.init(jax.random.PRNGKey(0), x[:1])
    # perturb BN stats/affine so the fold is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.1, 0.5, a.shape).astype(np.float32))
        if a.ndim == 1 else a, variables)
    ref = judge.apply(variables, x, train=False)
    apply_q, qvars = quant.quantized_judge(judge, variables)
    got = apply_q(qvars, x)
    corr, top1 = _logit_agreement(ref, got)
    assert corr > 0.99, corr
    assert top1 >= 0.8, top1


def _rel_err(ref, got):
    ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    return float(np.sqrt(np.mean((ref - got) ** 2))
                 / (np.std(ref) + 1e-12))


def test_int8_simple_unet_matches_fp32():
    from tsr_tpu.models import SimpleUNet

    unet = SimpleUNet(widths=(8, 16))
    x = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (4, 32, 32, 3)).astype(np.float32))
    variables = unet.init(jax.random.PRNGKey(0), x[:1])
    ref = unet.apply(variables, x)
    apply_q, qvars = quant.quantized_restorer(unet, variables)
    got = jax.jit(apply_q)(qvars, x)
    assert got.shape == ref.shape
    assert _rel_err(ref, got) < 0.06, _rel_err(ref, got)


def test_int8_resunet_matches_fp32():
    from tsr_tpu.models import ResUNet

    resunet = ResUNet(widths=(8, 16, 24), bottleneck_width=32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    variables = resunet.init(jax.random.PRNGKey(0), x[:1], train=True)
    # perturb BN stats/affine so the fold is non-trivial
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                rng.uniform(0.05, 0.3, a.shape).astype(np.float32)),
            variables["batch_stats"]),
    }
    ref = resunet.apply(variables, x, train=False)
    apply_q, qvars = quant.quantized_restorer(resunet, variables)
    got = jax.jit(apply_q)(qvars, x)
    assert got.shape == ref.shape
    assert _rel_err(ref, got) < 0.08, _rel_err(ref, got)


def test_quantized_judge_drops_into_fused_eval():
    judge = VGG16(num_classes=4, cfg=TINY_CFG, fc_width=32)
    imgs, labels = synthetic.make_dataset(4, 4, 32)
    variables = judge.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    apply_q, qvars = quant.quantized_judge(judge, variables)
    step_fp = tsr_eval.make_fused_eval_step(None, judge.apply)
    step_q = tsr_eval.make_fused_eval_step(None, apply_q)
    out_fp = step_fp(None, variables, imgs, labels, None)
    out_q = step_q(None, qvars, imgs, labels, None)
    agree = float(np.mean(np.asarray(out_fp["pred"])
                          == np.asarray(out_q["pred"])))
    assert agree >= 0.875, agree
    assert out_q["confidence"].shape == out_fp["confidence"].shape


def test_int8_simple_unet_input_minmax_matches_fp32():
    """The int8 forward mirrors SimpleUNet's input_minmax stretch — a
    compressed-range (fogged) input must go through the same per-image
    normalization in both paths."""
    from tsr_tpu.models import SimpleUNet

    unet = SimpleUNet(widths=(8, 16), input_minmax=True)
    x = jnp.asarray(np.random.default_rng(5).uniform(
        0.6, 0.9, (4, 32, 32, 3)).astype(np.float32))  # fog-like range
    variables = unet.init(jax.random.PRNGKey(0), x[:1])
    ref = unet.apply(variables, x)
    apply_q, qvars = quant.quantized_restorer(unet, variables)
    got = jax.jit(apply_q)(qvars, x)
    assert _rel_err(ref, got) < 0.06, _rel_err(ref, got)
