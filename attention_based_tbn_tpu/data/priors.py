"""Attention prior weights over the audio temporal axis.

The prior length tracks the BN-Inception temporal output width: a 256x800
spectrogram (4 s of audio) leaves the tower as an 8x25 feature map, so the
anchor is 25/4 positions per second and ``win = round(audio_length * 25/4)``
(reference core/dataset/dataset.py:534-541, core/models/model.py:60-61).

Three prior families (reference dataset.py:543-575):
* gaussian — unimodal Gaussian (sigma=1) centred on the window;
* uniform  — 1/win everywhere;
* loud     — the Gaussian re-centred on the loudest ``win``-sized
  spectrogram block, flattened to the Gaussian's min outside +-4 of the mode.
"""

from __future__ import annotations

import numpy as np

ATTENTION_ANCHOR = 25.0 / 4.0


def attention_window_size(audio_length: float) -> int:
    """Temporal length of the post-tower audio feature (and of the priors)."""
    # Python 3 round() is banker's rounding, same as the reference's use.
    return round(audio_length * ATTENTION_ANCHOR)


def gaussian_kernel(ksize: int, sigma: float = 1.0) -> np.ndarray:
    """Normalized 1-D Gaussian identical to cv2.getGaussianKernel(ksize, sigma).

    Delegates to cv2 when importable (the reference's source of these
    kernels — attention.py:121-124, dataset.py:545): cv2's *even*-size
    kernels are not plain sampled Gaussians (the two center taps share a
    single exp(0)=1 weight), so the analytic restatement below is exact for
    odd sizes only and serves as the cv2-free fallback."""
    try:
        import cv2

        return np.asarray(cv2.getGaussianKernel(int(ksize), float(sigma)))
    except ImportError:
        pass
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    positions = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    kernel = np.exp(-(positions**2) / (2.0 * sigma**2))
    kernel /= kernel.sum()
    return kernel.reshape(-1, 1)


def gaussian_prior(win_size: int) -> np.ndarray:
    return gaussian_kernel(win_size, sigma=1.0).astype(np.float32)


def uniform_prior(win_size: int) -> np.ndarray:
    return (np.ones((win_size, 1), dtype=np.float32) / win_size).astype(np.float32)


def loud_prior(spec: np.ndarray, win_size: int) -> np.ndarray:
    """Gaussian prior re-centred on the loudest spectrogram window.

    ``spec`` is a (freq, time) log-power spectrogram. Only complete
    ``win_size`` blocks along time are scored; loudness is the block max.

    Documented quirk (faithful to reference dataset.py:560-571): the
    re-centering gate compares the loudest BLOCK INDEX (0..T/win-1) against
    the WINDOW LENGTH — so with more than ``win_size`` blocks a late loud
    block leaves the prior centred, and ``loudest_loc == win_size`` rolls
    the peak off the end before the flattening erases it. Reproduced as-is
    so priors match the reference bit-for-bit.
    """
    loudness = []
    for idx in range(0, spec.shape[1], win_size):
        if idx + win_size <= spec.shape[1]:
            loudness.append(np.max(spec[:, idx : idx + win_size]))
    loudness = np.asarray(loudness)

    wts = gaussian_kernel(win_size, sigma=1.0)
    min_val = wts.min()
    mean_loc = wts.shape[0] // 2
    loudest_loc = int(np.argsort(loudness)[-1])

    if loudest_loc <= wts.shape[0] and (
        loudest_loc < mean_loc - 2 or loudest_loc > mean_loc + 2
    ):
        wts = np.roll(wts, loudest_loc - mean_loc)
        if loudest_loc - 4 > 0:
            wts[: loudest_loc - 4] = min_val
        if loudest_loc + 4 < wts.shape[0]:
            wts[loudest_loc + 4 :] = min_val

    return wts.astype(np.float32)


def attention_prior(
    prior_type: str, win_size: int, spec: np.ndarray | None = None
) -> np.ndarray:
    if prior_type == "gaussian":
        return gaussian_prior(win_size)
    if prior_type == "uniform":
        return uniform_prior(win_size)
    if prior_type == "loud":
        if spec is None:
            raise ValueError("'loud' prior needs the spectrogram")
        return loud_prior(spec, win_size)
    raise ValueError(f"Unknown prior type {prior_type!r}")
