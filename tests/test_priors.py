import numpy as np
import pytest

from attention_based_tbn_tpu.data.priors import (
    attention_prior,
    attention_window_size,
    gaussian_kernel,
    gaussian_prior,
    loud_prior,
    uniform_prior,
)


def test_window_size_anchor():
    # reference formula: round(audio_length * 25/4)
    assert attention_window_size(2.1) == 13
    assert attention_window_size(4.0) == 25
    assert attention_window_size(1.279) == 8


def test_gaussian_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    for ksize in (5, 13, 25):
        ours = gaussian_kernel(ksize, sigma=1.0)
        theirs = cv2.getGaussianKernel(ksize, sigma=1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_uniform_prior():
    p = uniform_prior(13)
    assert p.shape == (13, 1)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    assert np.all(p == p[0])


def test_gaussian_prior_properties():
    p = gaussian_prior(13)
    assert p.shape == (13, 1)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    assert np.argmax(p) == 6  # centred


def test_loud_prior_centres_on_loud_block():
    win = 13
    spec = np.full((8, 13 * 5), -10.0, dtype=np.float32)
    spec[:, 3 * win : 4 * win] = 5.0  # loudest block index 3
    p = loud_prior(spec, win)
    assert p.shape == (13, 1)
    assert np.argmax(p) == 3
    # flattened to min outside +-4 of the mode
    assert np.all(p[8:] == p.min())


def test_loud_prior_keeps_center_when_mode_central():
    win = 13
    spec = np.full((8, 13 * 5), -10.0, dtype=np.float32)
    spec[:, 0:win] += 0.0
    # loudest at block 0 -> rolled; loudest at center +-2 stays centred
    spec2 = np.full((8, 13 * 5), -10.0, dtype=np.float32)
    spec2[:, 6 * 13 // 13 * win : 7 * win] = 0  # block 6
    p = attention_prior("loud", win, spec=spec2)
    assert p.shape == (13, 1)


def test_attention_prior_dispatch():
    assert attention_prior("uniform", 9).shape == (9, 1)
    assert attention_prior("gaussian", 9).shape == (9, 1)
    with pytest.raises(ValueError):
        attention_prior("nope", 9)
    with pytest.raises(ValueError):
        attention_prior("loud", 9)
