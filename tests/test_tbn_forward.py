"""End-to-end TBN forward: modality combinations, attention variants,
consensus, waveform->spectrogram-in-model, 10-crop tiling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

B, N = 2, 3
H = W = 64  # small images to keep CPU compile fast; towers are resolution-agnostic
AUDIO_LEN = int(1.279 * 24000)  # -> 8-step attention window


def make_cfg(**over):
    base = {
        "data.audio.audio_length": 1.279,
        "tpu.compute_dtype": "float32",
    }
    base.update(over)
    return load_config(overrides=[f"{k}={v}" for k, v in base.items()])


def make_batch(modality, win=8, waveform=True):
    rng = np.random.default_rng(0)
    batch = {}
    if "RGB" in modality:
        batch["RGB"] = jnp.asarray(
            rng.standard_normal((B, N, H, W, 3)), jnp.float32
        )
    if "Flow" in modality:
        batch["Flow"] = jnp.asarray(
            rng.standard_normal((B, N, H, W, 10)), jnp.float32
        )
    if "Audio" in modality:
        if waveform:
            batch["Audio"] = jnp.asarray(
                rng.standard_normal((B, N, AUDIO_LEN)) * 0.1, jnp.float32
            )
        else:
            batch["Audio"] = jnp.asarray(
                rng.standard_normal((B, N, 256, 256, 1)), jnp.float32
            )
    return batch


def init_and_run(cfg, modality, batch, train=False):
    spec = TBNSpec.from_config(cfg, modality)
    model = TBNModel(spec)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = model.init(rngs, batch, train=False)
    if train:
        out, _ = model.apply(
            variables,
            batch,
            train=True,
            rngs={k: v for k, v in rngs.items() if k != "params"},
            mutable=["batch_stats"],
        )
    else:
        out = model.apply(variables, batch, train=False)
    return out


class TestForward:
    def test_rgb_only(self):
        cfg = make_cfg(**{"model.attention.enable": False})
        out = init_and_run(cfg, ["RGB"], make_batch(["RGB"]))
        assert out["verb"].shape == (B, 125)
        assert out["noun"].shape == (B, 352)
        assert "weights" not in out

    def test_trimodal_no_attention(self):
        cfg = make_cfg(**{"model.attention.enable": False})
        modality = ["RGB", "Flow", "Audio"]
        out = init_and_run(cfg, modality, make_batch(modality))
        assert out["verb"].shape == (B, 125)

    def test_trimodal_mha(self):
        cfg = make_cfg(**{"model.attention.type": "mha"})
        modality = ["RGB", "Flow", "Audio"]
        out = init_and_run(cfg, modality, make_batch(modality))
        assert out["verb"].shape == (B, 125)
        assert out["weights"].shape == (B * N, 1, 8)
        np.testing.assert_allclose(
            np.asarray(out["weights"].sum(-1)), 1.0, rtol=1e-4
        )

    @pytest.mark.parametrize("att_type", ["unimodal", "proto"])
    def test_rgb_audio_attention_types(self, att_type):
        cfg = make_cfg(**{"model.attention.type": att_type})
        modality = ["RGB", "Audio"]
        out = init_and_run(cfg, modality, make_batch(modality), train=True)
        assert out["verb"].shape == (B, 125)
        assert out["weights"].shape == (B * N, 8)

    def test_fixed_prior_weights(self):
        cfg = make_cfg(**{"model.attention.use_fixed": True})
        modality = ["RGB", "Audio"]
        batch = make_batch(modality)
        batch["weights"] = jnp.ones((B, N, 8, 1), jnp.float32) / 8.0
        out = init_and_run(cfg, modality, batch)
        assert out["verb"].shape == (B, 125)
        assert "weights" not in out

    def test_audio_only(self):
        cfg = make_cfg(**{"model.attention.enable": False})
        out = init_and_run(cfg, ["Audio"], make_batch(["Audio"]))
        assert out["verb"].shape == (B, 125)

    def test_audio_only_learned_attention_rejected(self):
        cfg = make_cfg(**{"model.attention.type": "mha"})
        with pytest.raises(ValueError):
            init_and_run(cfg, ["Audio"], make_batch(["Audio"]))

    def test_consensus_is_segment_mean(self):
        # two identical segments -> consensus equals single-segment scores
        cfg = make_cfg(**{"model.attention.enable": False})
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        frame = np.random.default_rng(1).standard_normal((B, 1, H, W, 3))
        batch_same = {"RGB": jnp.asarray(np.tile(frame, (1, 3, 1, 1, 1)), jnp.float32)}
        batch_one = {"RGB": jnp.asarray(frame, jnp.float32)}
        variables = model.init(jax.random.key(0), batch_one, train=False)
        out3 = model.apply(variables, batch_same, train=False)
        out1 = model.apply(variables, batch_one, train=False)
        np.testing.assert_allclose(
            np.asarray(out3["verb"]), np.asarray(out1["verb"]), rtol=1e-4, atol=1e-5
        )

    def test_ten_crop_audio_tiling(self):
        # visual streams carry N*10 crops, audio only N -> audio tiled
        cfg = make_cfg(**{"model.attention.enable": False})
        modality = ["RGB", "Audio"]
        spec = TBNSpec.from_config(cfg, modality)
        model = TBNModel(spec)
        rng = np.random.default_rng(2)
        batch = {
            "RGB": jnp.asarray(rng.standard_normal((B, N * 10, H, W, 3)), jnp.float32),
            "Audio": jnp.asarray(
                rng.standard_normal((B, N, AUDIO_LEN)) * 0.1, jnp.float32
            ),
        }
        variables = model.init(jax.random.key(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        assert out["verb"].shape == (B, 125)

    def _crop_major_batch(self, rng):
        """Ten-crop batch whose 10 crop rows per segment are identical
        copies of that segment's frame (crop-major row order: row =
        loc*2N + seg*2 + flip), plus per-segment-DISTINCT audio, and the
        equivalent plain batch. With correct audio/crop row pairing the
        ten-crop consensus must equal the plain consensus; any misalignment
        (e.g. the reference's dormant rep-major repeat, model.py:243-248)
        pairs some crop row with another segment's audio and shifts the
        logits through the fusion ReLU."""
        frames = rng.standard_normal((B, N, H, W, 3))
        crops = np.broadcast_to(
            frames[:, None, :, None], (B, 5, N, 2, H, W, 3)
        ).reshape(B, 10 * N, H, W, 3)
        audio = rng.standard_normal((B, N, AUDIO_LEN)) * 0.05
        # make segments SPECTRALLY distinct (tones at well-separated
        # frequencies) so misalignment must move the logits — amplitude
        # scaling alone only shifts the log-spectrogram additively
        t = np.arange(AUDIO_LEN) / 24000.0
        tones = np.stack(
            [np.sin(2 * np.pi * (400.0 + 2500.0 * k) * t) for k in range(N)]
        )
        audio = audio + tones[None]
        batch10 = {
            "RGB": jnp.asarray(crops, jnp.float32),
            "Audio": jnp.asarray(audio, jnp.float32),
        }
        batch1 = {
            "RGB": jnp.asarray(frames, jnp.float32),
            "Audio": jnp.asarray(audio, jnp.float32),
        }
        return batch10, batch1

    def _run_alignment(self, attention_enable, attention_type="mha",
                       check_swap=True):
        over = {"model.attention.enable": attention_enable}
        if attention_enable:
            over["model.attention.type"] = attention_type
        cfg = make_cfg(**over)
        spec = TBNSpec.from_config(cfg, ["RGB", "Audio"])
        model = TBNModel(spec)
        rng = np.random.default_rng(7)
        batch10, batch1 = self._crop_major_batch(rng)
        variables = model.init(jax.random.key(0), batch1, train=False)
        out10 = model.apply(variables, batch10, train=False)
        out1 = model.apply(variables, batch1, train=False)
        np.testing.assert_allclose(
            np.asarray(out10["verb"]), np.asarray(out1["verb"]),
            rtol=2e-4, atol=2e-5,
        )
        if not check_swap:
            return
        # sensitivity: swapping two audio segments must move the logits —
        # proves the equality above would catch a mispaired tiling
        swapped = dict(batch10)
        perm = np.arange(N)
        perm[0], perm[1] = 1, 0
        swapped["Audio"] = batch10["Audio"][:, perm]
        out_sw = model.apply(variables, swapped, train=False)
        # untrained logits move little, but well above the equality
        # tolerance (~2.6e-5 at |logit|~0.03) — measured ~4e-4
        assert np.abs(
            np.asarray(out_sw["verb"]) - np.asarray(out10["verb"])
        ).max() > 1e-4

    def test_ten_crop_alignment_no_attention(self):
        # fused rows must pair visual crop rows with the SAME segment's audio
        self._run_alignment(attention_enable=False)

    def test_ten_crop_alignment_mha(self):
        # learned attention pre-tiles the audio sequence crop-major; each
        # crop row attends over its own segment's audio window. The
        # softmax-averaged MHA output is nearly swap-insensitive at random
        # init (measured ~2e-5), so the logit-swap canary is skipped —
        # test_tile_crop_rows_ordering pins the row convention directly.
        self._run_alignment(
            attention_enable=True, attention_type="mha", check_swap=False
        )

    def test_tile_crop_rows_ordering(self):
        # row convention: visual ten-crop row = loc*2N + seg*2 + flip
        # (data/transforms.py ten_crop); audio row (b, seg) must land on
        # exactly those rows
        from attention_based_tbn_tpu.models.tbn import tile_crop_rows

        b, n, reps = 2, 3, 10
        feature = jnp.asarray(
            np.arange(b * n, dtype=np.float32).reshape(b * n, 1)
        )  # value encodes (b, seg): b*n + seg
        tiled = np.asarray(tile_crop_rows(feature, b, reps))
        assert tiled.shape == (b * reps * n, 1)
        for bi in range(b):
            for loc in range(reps // 2):
                for seg in range(n):
                    for flip in range(2):
                        row = bi * reps * n + loc * 2 * n + seg * 2 + flip
                        assert tiled[row, 0] == bi * n + seg, (
                            bi, loc, seg, flip,
                        )
        # odd reps: plain per-sample repeat, rep-major within the sample
        tiled3 = np.asarray(tile_crop_rows(feature, b, 3))
        for bi in range(b):
            for rep in range(3):
                for seg in range(n):
                    row = bi * 3 * n + rep * n + seg
                    assert tiled3[row, 0] == bi * n + seg

    def test_ten_crop_alignment_unimodal(self):
        self._run_alignment(attention_enable=True, attention_type="unimodal")

    def test_uint8_affine_equals_explicit_normalize(self):
        # the uint8 batch path normalizes inside the stem conv
        # (layers.TorchConv input_scale/offset); feeding the explicitly
        # normalized float batch must give identical logits
        cfg = make_cfg(**{"model.attention.enable": False})
        modality = ["RGB", "Flow"]
        spec = TBNSpec.from_config(cfg, modality)
        model = TBNModel(spec)
        rng = np.random.default_rng(11)
        u8 = {
            "RGB": jnp.asarray(
                rng.integers(0, 255, (B, N, H, W, 3)), jnp.uint8
            ),
            "Flow": jnp.asarray(
                rng.integers(0, 255, (B, N, H, W, 10)), jnp.uint8
            ),
        }

        def norm(x, mean, std):
            x = np.asarray(x, np.float32) / 255.0
            reps = x.shape[-1] // len(mean)
            return (x - np.asarray(mean * reps, np.float32)) / np.asarray(
                std * reps, np.float32
            )

        fl = {
            "RGB": jnp.asarray(norm(u8["RGB"], list(spec.rgb_mean), list(spec.rgb_std))),
            "Flow": jnp.asarray(
                norm(u8["Flow"], list(spec.flow_mean), list(spec.flow_std))
            ),
        }
        variables = model.init(jax.random.key(0), u8, train=False)
        out_u8 = model.apply(variables, u8, train=False)
        out_fl = model.apply(variables, fl, train=False)
        np.testing.assert_allclose(
            np.asarray(out_u8["verb"]), np.asarray(out_fl["verb"]),
            rtol=2e-4, atol=2e-5,
        )

    def test_audio_dropout_path(self):
        cfg = make_cfg(
            **{"model.attention.enable": False, "data.audio.dropout": 0.5}
        )
        modality = ["RGB", "Audio"]
        out = init_and_run(cfg, modality, make_batch(modality), train=True)
        assert np.all(np.isfinite(np.asarray(out["verb"])))

    def test_bfloat16_compute(self):
        cfg = make_cfg(
            **{"tpu.compute_dtype": "bfloat16", "model.attention.enable": False}
        )
        out = init_and_run(cfg, ["RGB"], make_batch(["RGB"]))
        # consensus casts scores to fp32
        assert out["verb"].dtype == jnp.float32

    def test_audio_only_logms(self):
        # BASELINE config #1: audio-only BN-Inception on 1.279 s log-mel
        cfg = make_cfg(
            **{"model.attention.enable": False, "data.audio.spec_type": "logms"}
        )
        out = init_and_run(cfg, ["Audio"], make_batch(["Audio"]))
        assert out["verb"].shape == (B, 125)
        assert np.all(np.isfinite(np.asarray(out["verb"])))

    def test_trimodal_async_sampling_config(self):
        # BASELINE config #4: async sampling changes the host sampler only;
        # the model consumes identical shapes
        cfg = make_cfg(
            **{"model.attention.enable": False, "data.sampling": "async"}
        )
        modality = ["RGB", "Flow", "Audio"]
        out = init_and_run(cfg, modality, make_batch(modality))
        assert out["verb"].shape == (B, 125)

    def test_action_head(self):
        cfg = make_cfg(
            **{
                "model.attention.enable": False,
                "model.num_classes": "{verb: 125, noun: 352, action: 2513}",
            }
        )
        out = init_and_run(cfg, ["RGB"], make_batch(["RGB"]))
        assert out["action"].shape == (B, 2513)


class TestHostPackedVisualInput:
    def test_packed_input_matches_unpacked(self):
        """Host-column-paired (B, N, H, W/2, 2C) visual input produces the
        same logits as the unpacked (B, N, H, W, C) input — the loader's
        pack (data/loader.py pack_visual) is a pure reshape consumed
        natively by the packed stem (layers.TorchConv input_packed)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

        cfg = load_config(
            overrides=[
                "model.attention.enable=False",
                "model.num_classes={verb: 5, noun: 6}",
                "tpu.compute_dtype=float32",
            ]
        )
        rng = np.random.default_rng(0)
        b, n, hw = 2, 2, 32
        rgb = rng.integers(0, 255, (b, n, hw, hw, 3)).astype(np.uint8)
        flow = rng.integers(0, 255, (b, n, hw, hw, 10)).astype(np.uint8)

        model = TBNModel(TBNSpec.from_config(cfg, ["RGB", "Flow"]))
        plain = {"RGB": jnp.asarray(rgb), "Flow": jnp.asarray(flow)}
        packed = {
            "RGB": jnp.asarray(rgb.reshape(b, n, hw, hw // 2, 6)),
            "Flow": jnp.asarray(flow.reshape(b, n, hw, hw // 2, 20)),
        }
        variables = model.init(jax.random.key(0), plain, train=False)
        out_plain = model.apply(variables, plain, train=False)
        out_packed = model.apply(variables, packed, train=False)
        for key in ("verb", "noun"):
            np.testing.assert_allclose(
                np.asarray(out_plain[key]),
                np.asarray(out_packed[key]),
                rtol=1e-6,
                atol=1e-6,
            )

    def test_direct_stem_unpacks_packed_input(self):
        """tpu.direct_stem=True with a host-packed stream must UNPACK and
        run the direct 7x7 conv (regression: input_packed auto-detect
        silently overrode the direct-stem A/B, so both arms measured the
        packed stem). Same params, same logits as the unpacked input."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

        cfg = load_config(
            overrides=[
                "model.attention.enable=False",
                "model.num_classes={verb: 5, noun: 6}",
                "tpu.compute_dtype=float32",
                "tpu.direct_stem=True",
            ]
        )
        rng = np.random.default_rng(0)
        b, n, hw = 2, 2, 32
        rgb = rng.integers(0, 255, (b, n, hw, hw, 3)).astype(np.uint8)

        model = TBNModel(TBNSpec.from_config(cfg, ["RGB"]))
        plain = {"RGB": jnp.asarray(rgb)}
        packed = {"RGB": jnp.asarray(rgb.reshape(b, n, hw, hw // 2, 6))}
        variables = model.init(jax.random.key(0), plain, train=False)
        out_plain = model.apply(variables, plain, train=False)
        out_packed = model.apply(variables, packed, train=False)
        for key in ("verb", "noun"):
            np.testing.assert_allclose(
                np.asarray(out_plain[key]),
                np.asarray(out_packed[key]),
                rtol=1e-6,
                atol=1e-6,
            )

    def test_packed_train_step_shapes(self):
        """The packed input also works on the train path (live BN +
        backward through the packed stem)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

        cfg = load_config(
            overrides=[
                "model.attention.enable=False",
                "model.num_classes={verb: 5, noun: 6}",
                "tpu.compute_dtype=float32",
            ]
        )
        rng = np.random.default_rng(0)
        b, n, hw = 2, 2, 32
        rgb = rng.integers(0, 255, (b, n, hw, hw, 3)).astype(np.uint8)
        packed = {"RGB": jnp.asarray(rgb.reshape(b, n, hw, hw // 2, 6))}
        plain = {"RGB": jnp.asarray(rgb)}

        model = TBNModel(TBNSpec.from_config(cfg, ["RGB"]))
        variables = model.init(jax.random.key(0), plain, train=False)

        out_p, mut_p = model.apply(
            variables, plain, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        out_k, mut_k = model.apply(
            variables, packed, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        np.testing.assert_allclose(
            np.asarray(out_p["verb"]), np.asarray(out_k["verb"]),
            rtol=1e-5, atol=1e-5,
        )
