"""Host-side (numpy/cv2) PSNR/SSIM, numerically matching tsr_tpu.ops.image.

Why these exist: restore_tree (tsr_tpu.infer) scores restored output
against the clean tree (ref:08:111-129). Computing those metrics on device
requires uploading the clean batch — through a remote-TPU relay that is a
*third of all link traffic* for zero device work worth doing remotely
(PSNR/SSIM at 224px is microseconds of host math). The measured batch
sweep (benchmarks/readings/r5/restore_ab_v0.jsonl) shows the tree walk is
relay-bandwidth-bound, so the clean tree never leaves the host: the
producer decodes it, these functions score it on the writer pool, and the
link carries only (bad up, restored down).

Numeric contract: identical formulas to ops.image.psnr / ops.image.ssim
(skimage-compatible, ref:08:123-125) — uniform ``win_size`` window,
'valid' crop, sample-covariance normalization, per-channel mean. Parity
asserted by tests/test_infer.py::test_host_metrics_match_device.
"""

from __future__ import annotations

import numpy as np


def psnr(a_u8: np.ndarray, b_u8: np.ndarray,
         data_range: float = 255.0) -> np.ndarray:
    """[B,H,W,C] uint8 x2 -> [B] PSNR in dB (ops.image.psnr equivalent)."""
    a = a_u8.astype(np.float32)
    b = b_u8.astype(np.float32)
    axes = tuple(range(a.ndim - 3, a.ndim))
    mse = np.mean((a - b) ** 2, axis=axes)
    with np.errstate(divide="ignore"):
        return 10.0 * np.log10((data_range ** 2) / mse)


def _uniform_valid(x: np.ndarray, win: int) -> np.ndarray:
    """'valid' uniform win x win filter on [H,W,C] float32 via cv2 box
    filter (runs the full 'same' map, then crops the border — exactly the
    pixels a VALID conv would keep)."""
    import cv2

    m = cv2.boxFilter(x, ddepth=-1, ksize=(win, win), normalize=True,
                      borderType=cv2.BORDER_CONSTANT)
    r = (win - 1) // 2
    out = m[r:x.shape[0] - r, r:x.shape[1] - r]
    return out if out.ndim == 3 else out[..., None]


def ssim(a_u8: np.ndarray, b_u8: np.ndarray, data_range: float = 255.0,
         win_size: int = 7) -> np.ndarray:
    """[B,H,W,C] uint8 x2 -> [B] mean SSIM (ops.image.ssim equivalent)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    n = win_size * win_size
    cov_norm = n / (n - 1.0)

    out = np.empty(a_u8.shape[0], np.float32)
    for i in range(a_u8.shape[0]):
        a = a_u8[i].astype(np.float32)
        b = b_u8[i].astype(np.float32)
        ux = _uniform_valid(a, win_size)
        uy = _uniform_valid(b, win_size)
        uxx = _uniform_valid(a * a, win_size)
        uyy = _uniform_valid(b * b, win_size)
        uxy = _uniform_valid(a * b, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux * ux + uy * uy + c1) * (vx + vy + c2))
        out[i] = float(np.mean(s))
    return out
