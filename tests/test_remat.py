"""Rematerialization flag: gradients flow and match the non-remat path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.losses import tbn_loss
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec


def _grads(remat: bool, packed: bool = False, dtype: str = "float32"):
    # fp32 by default: the remat and plain backwards are the same math
    # (verified bitwise-identical in fp32), but under bf16 the recomputed
    # activations round differently per fusion and the difference chaos-
    # amplifies through the deep backward (~60% relative on conv1 grads),
    # so a bf16 comparison tests XLA's rounding, not the remat plumbing.
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.num_classes={verb: 3, noun: 3}",
            "model.pretrained=False",
            f"tpu.compute_dtype={dtype}",
            f"tpu.remat={'true' if remat else 'false'}",
        ]
    )
    spec = TBNSpec.from_config(cfg, ["RGB"])
    model = TBNModel(spec)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 2, 64, 64, 3))
    if packed:
        # host-column-paired stream (loader pack_visual): (B, N, H, W/2, 2C)
        # — the input_packed=True tower path, which nn.remat must treat as
        # STATIC (a traced bool regressed here once)
        frames = frames.reshape(2, 2, 64, 32, 6)
    batch = {"RGB": jnp.asarray(frames, jnp.uint8)}
    targets = {
        "class": {
            "verb": jnp.asarray([0, 1], jnp.int32),
            "noun": jnp.asarray([1, 2], jnp.int32),
        }
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {
            "params": jax.random.key(0),
            "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2),
            "audio_dropout": jax.random.key(3),
        },
        batch,
    )

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            train=True,
            rngs={"dropout": jax.random.key(5), "audio_dropout": jax.random.key(6)},
            mutable=["batch_stats"],
        )
        return tbn_loss(preds, targets, cfg, train=True)["total"]

    return jax.jit(jax.grad(loss_fn))(variables["params"])


@pytest.mark.slow  # ~95 s: compiles the backward twice (remat on/off)
def test_remat_grads_match():
    """Same math, different executables: the remat recompute rounds
    differently per-fusion on the CPU backend, and through ~15 layers of
    small-batch BN backwards (divide by a 4-row σ) the delta amplifies
    ~1.7x per layer — measured 1e-5 relative at the head vs 3e-2 at conv1
    (on the TPU backend the two programs happen to be bitwise identical).
    So: tight elementwise check at the head, relative-Frobenius check at
    the bottom (a semantic break — dropped tap, wrong mask — shows up as
    O(1) relative error there)."""
    g_plain = _grads(remat=False)
    g_remat = _grads(remat=True)
    head_a = np.asarray(g_plain["classifier"]["verb"]["kernel"], np.float64)
    head_b = np.asarray(g_remat["classifier"]["verb"]["kernel"], np.float64)
    np.testing.assert_allclose(head_a, head_b, rtol=1e-3, atol=1e-5)
    leaf_a = np.asarray(
        g_plain["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"], np.float64
    )
    leaf_b = np.asarray(
        g_remat["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"], np.float64
    )
    assert np.abs(leaf_a).sum() > 0
    rel = np.linalg.norm(leaf_a - leaf_b) / np.linalg.norm(leaf_a)
    assert rel < 0.05, f"conv1 grad relative Frobenius error {rel:.4f}"


def test_remat_packed_input_compiles():
    """remat + the loader's column-packed uint8 stream: input_packed must
    stay a static bool through nn.remat (regression: it was passed as a
    keyword, traced, and raised TracerBoolConversionError)."""
    g = _grads(remat=True, packed=True, dtype="bfloat16")
    leaf = np.asarray(g["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"])
    assert np.abs(leaf).sum() > 0
