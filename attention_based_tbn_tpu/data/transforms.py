"""Host-side geometric transforms (pure NumPy/cv2, explicit RNG).

Reproduces the reference transform pipeline semantics
(reference core/dataset/transform.py) on whole frame groups: one crop /
flip decision is drawn per sample and applied to every frame of every
segment, exactly like the reference's list-of-ndarray transforms.

The tensorization half of the reference pipeline (ToTensor /255 +
Normalize) moved on-device (models/tbn.py:_normalize) — the host hands
uint8 stacks to the device.

Train (RGB/Flow): MultiScaleCrop (TSN scale + fixed-offset jitter)
-> RandomHorizontalFlip. Eval: Rescale shorter side -> CenterCrop
(the reference's 10-crop FixedCrop exists for completeness; it is commented
out at the reference's call sites).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

_INTER_LINEAR = 1  # cv2.INTER_LINEAR, inlined so cv2 can stay a lazy import


def rescale(frames: np.ndarray, size, interpolation=_INTER_LINEAR) -> np.ndarray:
    """Shorter-side (int size) or exact (tuple) rescale of (N, H, W, C).

    cv2 is imported lazily: only resizing needs it, and the native-decode
    pipeline (dataset._require_cv2 gates the other uses) must be able to
    import this module on hosts without opencv."""
    import cv2
    n, h, w = frames.shape[:3]
    if isinstance(size, int):
        if h > w:
            new_h, new_w = int(size * h / w), size
        else:
            new_h, new_w = size, int(size * w / h)
    else:
        new_h, new_w = size
    if (new_h, new_w) == (h, w):
        return frames
    out = np.empty(
        (n, new_h, new_w) + frames.shape[3:], dtype=frames.dtype
    )
    for i in range(n):
        resized = cv2.resize(frames[i], (new_w, new_h), interpolation=interpolation)
        out[i] = resized.reshape(out.shape[1:])
    return out


def center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    h, w = frames.shape[1:3]
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return frames[:, y0 : y0 + size, x0 : x0 + size]


def crop_at(frames: np.ndarray, y0: int, x0: int, ch: int, cw: int) -> np.ndarray:
    return frames[:, y0 : y0 + ch, x0 : x0 + cw]


def horizontal_flip(frames: np.ndarray) -> np.ndarray:
    return frames[:, :, ::-1]


def fixed_crop_offsets(image_w: int, image_h: int, crop_w: int, crop_h: int,
                       more_fix_crop: bool = True) -> List[Tuple[int, int]]:
    """TSN fixed offset grid (reference transform.py:389-412): corners,
    center, and (more_fix_crop) edge/quarter positions. Returns (x, y);
    argument order matches the reference's fill_fix_offset."""
    w_step = (image_w - crop_w) / 4
    h_step = (image_h - crop_h) / 4
    ret = [
        (0, 0),
        (4 * w_step, 0),
        (0, 4 * h_step),
        (4 * w_step, 4 * h_step),
        (2 * w_step, 2 * h_step),
    ]
    if more_fix_crop:
        ret += [
            (0, 2 * h_step),
            (4 * w_step, 2 * h_step),
            (2 * w_step, 4 * h_step),
            (2 * w_step, 0 * h_step),
            (1 * w_step, 1 * h_step),
            (3 * w_step, 1 * h_step),
            (1 * w_step, 3 * h_step),
            (3 * w_step, 3 * h_step),
        ]
    return [(int(x), int(y)) for x, y in ret]


def multi_scale_crop(
    frames: np.ndarray,
    input_size: int,
    scales: Sequence[float] = (1, 0.875, 0.75, 0.66),
    max_distort: int = 1,
    fix_crop: bool = True,
    more_fix_crop: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """TSN MultiScaleCrop (reference transform.py:284-412): pick a
    (crop_w, crop_h) pair from the scale grid (|i - j| <= max_distort,
    snapping within 3px of input_size), crop at a random fixed offset,
    rescale to input_size."""
    if rng is None:
        raise ValueError("multi_scale_crop needs an explicit rng")
    img_h, img_w = frames.shape[1:3]
    base = min(img_h, img_w)
    crop_sizes = [int(base * s) for s in scales]
    snap = lambda x: input_size if abs(x - input_size) < 3 else x
    crop_h_opts = [snap(x) for x in crop_sizes]
    crop_w_opts = [snap(x) for x in crop_sizes]

    pairs = [
        (w, h)
        for i, h in enumerate(crop_h_opts)
        for j, w in enumerate(crop_w_opts)
        if abs(i - j) <= max_distort
    ]
    crop_w, crop_h = pairs[rng.integers(len(pairs))]

    if fix_crop:
        offsets = fixed_crop_offsets(img_w, img_h, crop_w, crop_h, more_fix_crop)
        x0, y0 = offsets[rng.integers(len(offsets))]
    else:
        # reference transform.py:373-374 uses np.random.randint (EXCLUSIVE
        # upper bound) — identical distribution here. Its span-0 case (a
        # scale-1.0 crop on the shorter side) raises in the reference
        # (np.random.randint(0, 0)), which makes fix_crop=False unusable
        # with the standard scale grid; we return offset 0 there instead
        # (documented divergence, same class as PARITY.md item 1).
        span_w, span_h = img_w - crop_w, img_h - crop_h
        x0 = int(rng.integers(0, span_w)) if span_w > 0 else 0
        y0 = int(rng.integers(0, span_h)) if span_h > 0 else 0

    cropped = crop_at(frames, y0, x0, crop_h, crop_w)
    return rescale(cropped, (input_size, input_size))


def ten_crop(frames: np.ndarray, size: int) -> np.ndarray:
    """FixedCrop 5 locations x (id, hflip) -> (10*N, size, size, C)
    (reference transform.py:106-179; crop-major ordering)."""
    h, w = frames.shape[1:3]
    locations = [
        ((h - size) // 2, (w - size) // 2),  # center
        (0, 0),
        (0, w - size),
        (h - size, 0),
        (h - size, w - size),
    ]
    out = []
    for y0, x0 in locations:
        crop = crop_at(frames, y0, x0, size, size)
        for frame, flipped in zip(crop, horizontal_flip(crop)):
            out.append(frame)
            out.append(flipped)
    return np.stack(out, axis=0)


def train_visual_transform(
    frames: np.ndarray,
    crop_size: int,
    scales: Sequence[float],
    flip_prob: float,
    rng: np.random.Generator,
) -> np.ndarray:
    out = multi_scale_crop(frames, crop_size, scales=scales, rng=rng)
    if rng.random() < flip_prob:
        out = horizontal_flip(out)
    return np.ascontiguousarray(out)


def eval_visual_transform(
    frames: np.ndarray, scale_size: int, crop_size: int
) -> np.ndarray:
    return np.ascontiguousarray(center_crop(rescale(frames, scale_size), crop_size))
