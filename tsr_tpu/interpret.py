"""Interpretability: VGG feature taps, heatmaps, GAP embeddings, 2-D
projection export.

Covers the reference's interpretability arm:

- hidden-state heatmaps: tap ``features[:k+1]`` output, channel-mean,
  min-max normalize (ref:11:31-56; TARGET_LAYER=2 at ref:11:93),
- GAP embeddings: full ``features`` output [B,7,7,512] -> global average
  pool -> [B,512] (ref:12:37-58),
- 2-D projection + ``umap_embeddings.pt``-schema export: dict with
  ``embeddings [N,2]``, ``labels`` (list of mode names), and
  ``original_features [N,512]`` (ref:12:145-150).

``project_2d(method="umap")`` (the default, matching ref:12) runs the
in-house UMAP in :mod:`tsr_tpu.umap_lite` — fuzzy simplicial set +
negative-sampling SGD layout with the reference's parameters
(n_neighbors=15, min_dist=0.1, metric='cosine', random_state=42).
TSNE(cosine) and PCA remain as fallbacks. The export schema is unchanged.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsr_tpu.ops import image as image_ops


def make_tap_fn(vgg_apply: Callable, tap_layer: int,
                normalize: bool = True):
    """uint8 batch -> tapped feature maps (NHWC).

    The reference normalizes interpretability inputs with ImageNet stats
    (ref:11:73-78, ref:12:66-70)."""

    @jax.jit
    def tap(variables, images_u8):
        x01 = image_ops.to_float01(images_u8)
        if normalize:
            x01 = image_ops.imagenet_normalize(x01)
        return vgg_apply(variables, x01, tap_layer=tap_layer)

    return tap


def heatmap(features_nhwc) -> np.ndarray:
    """Channel-mean + per-image min-max -> [B,H,W] in [0,1] (ref:11:46-56)."""
    h = jnp.mean(jnp.asarray(features_nhwc), axis=-1)
    lo = jnp.min(h, axis=(1, 2), keepdims=True)
    hi = jnp.max(h, axis=(1, 2), keepdims=True)
    return np.asarray((h - lo) / jnp.maximum(hi - lo, 1e-12))


def gap_features(features_nhwc) -> np.ndarray:
    """Global average pool [B,H,W,C] -> [B,C] (ref:12:46-58)."""
    return np.asarray(jnp.mean(jnp.asarray(features_nhwc), axis=(1, 2)))


def project_2d(features: np.ndarray, method: str = "umap",
               seed: int = 42) -> np.ndarray:
    """2-D embedding of [N,D] features.

    ``umap`` (default): in-house UMAP with the reference's parameters
    — UMAP(n_neighbors=15, min_dist=0.1, metric='cosine',
    random_state=42) (ref:12:131-139). ``tsne``: sklearn TSNE(cosine)
    fallback. ``pca``: fast linear fallback.
    """
    if method == "umap":
        from tsr_tpu.umap_lite import umap_embed

        return umap_embed(features, n_neighbors=15, min_dist=0.1,
                          n_components=2, metric="cosine",
                          random_state=seed)
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=2, random_state=seed).fit_transform(features)
    from sklearn.manifold import TSNE

    n = len(features)
    return TSNE(
        n_components=2, metric="cosine", random_state=seed,
        perplexity=min(30.0, max(2.0, (n - 1) / 3.0)), init="pca",
    ).fit_transform(features)


def export_embeddings_pt(
    path: str,
    embeddings: np.ndarray,
    labels: Sequence[str],
    original_features: np.ndarray,
) -> None:
    """Write the ``umap_embeddings.pt``-schema dict (ref:12:145-150)."""
    import torch

    torch.save(
        {
            "embeddings": torch.tensor(np.asarray(embeddings)),
            "labels": list(labels),
            "original_features": torch.tensor(
                np.asarray(original_features)),
        },
        path,
    )


def collect_mode_embeddings(
    vgg_apply: Callable,
    variables,
    mode_batches: Dict[str, "np.ndarray"],
    batch_size: int = 64,
    tap_layer: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """GAP-embed a dict of mode-name -> uint8 image stacks (the 7 modes of
    ref:12:21-29) and return mode -> [n,512] features.

    ``tap_layer`` defaults to the plain-vgg16 final pool (GAP_TAP);
    batchnorm judges must pass ``model.tap_index(GAP_TAP)``."""
    if tap_layer is None:
        from tsr_tpu.models.vgg import GAP_TAP

        tap_layer = GAP_TAP
    tap = make_tap_fn(vgg_apply, tap_layer=tap_layer)
    out: Dict[str, np.ndarray] = {}
    for mode, imgs in mode_batches.items():
        feats: List[np.ndarray] = []
        for s in range(0, len(imgs), batch_size):
            f = tap(variables, imgs[s:s + batch_size])
            feats.append(gap_features(f))
        out[mode] = np.concatenate(feats) if feats else np.zeros((0, 512))
    return out
