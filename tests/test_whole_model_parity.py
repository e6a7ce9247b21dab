"""Whole-model fp32 logit parity against the reference's own PyTorch code.

Op-level parity (tests/test_torch_parity.py) cannot catch composition
errors — branch order inside a block, a stray eps, pooling placement. These
tests run the reference's *verbatim* torch modules (imported from
/root/reference) with random weights, convert the state dict with
models/convert.py, and assert end-to-end fp32 logit parity:

* the full BN-Inception tower graph via reference
  core/models/bn_inception_audio.py (self-contained torch: the complete
  inception 3a..5b stack + ceil-mode pools + attend/global pooling head);
* the full TBN composition via the reference's real ``TBNModel.forward``
  (core/models/model.py:205-262) — towers -> PE+MHA / unimodal / proto
  attention (core/models/attention.py, verbatim) -> fusion -> heads ->
  consensus — by subclassing TBNModel only to swap the tower factory
  (``_create_base_model``) for the self-contained tower above.

The reference's pretrainedmodels/torchvision imports (absent here, only
needed for weight downloads these tests never trigger) are satisfied with
empty module stubs.
"""

import importlib.util
import os
import sys
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.models.bn_inception import BNInception
from attention_based_tbn_tpu.models.convert import (
    convert_bninception,
    convert_tbn_checkpoint,
)
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core", "models")),
    reason="reference tree unavailable",
)


# ---------------------------------------------------------------------------
# Reference import machinery
# ---------------------------------------------------------------------------


def _stub_module(name, **attrs):
    # MERGE into an existing stub: another differential suite may have
    # registered the module earlier with different attributes (e.g. the
    # dataset loaders stub torchvision with only .transforms; the reference
    # vgg/resnet need .models) — returning it unchanged breaks whichever
    # suite runs second, a function of test order.
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for key, value in attrs.items():
        if not hasattr(mod, key):
            setattr(mod, key, value)
    return mod


def load_reference_models():
    """Import /root/reference/core/models as the package ``refmodels``."""
    if "refmodels.model" in sys.modules:
        return sys.modules

    _stub_module("torchvision", models=types.ModuleType("torchvision.models"))

    class _StubPtmBNInception(nn.Module):
        pass

    ptm_bn = _stub_module(
        "pretrainedmodels.models.bninception", BNInception=_StubPtmBNInception
    )
    ptm_models = _stub_module("pretrainedmodels.models", bninception=ptm_bn)
    _stub_module("pretrainedmodels", models=ptm_models)

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [os.path.join(REFERENCE, "core", "models")]
    sys.modules["refmodels"] = pkg

    for name in ("bn_inception_audio", "attention", "vgg", "resnet",
                 "bn_inception", "contrast_loss", "model"):
        path = os.path.join(REFERENCE, "core", "models", f"{name}.py")
        spec = importlib.util.spec_from_file_location(f"refmodels.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules


def randomize_state_dict(module: nn.Module, seed: int = 0) -> None:
    """Fill every float tensor with well-scaled random values (conv kernels
    at 1/sqrt(fan_in), BN affine/stats non-trivial) so the parity check
    exercises real arithmetic instead of identity BNs."""
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for key, value in sd.items():
        if not value.dtype.is_floating_point:
            new[key] = value
            continue
        if key.endswith((".pe", "prototype_wts")):
            # deterministic buffers the converter regenerates — keep
            new[key] = value
            continue
        if key.endswith("running_var"):
            new[key] = torch.rand(value.shape, generator=gen) * 1.2 + 0.4
        elif key.endswith("running_mean"):
            new[key] = torch.randn(value.shape, generator=gen) * 0.1
        elif value.ndim == 4:  # conv OIHW
            fan_in = value.shape[1] * value.shape[2] * value.shape[3]
            new[key] = torch.randn(value.shape, generator=gen) / np.sqrt(fan_in)
        elif value.ndim == 2:  # linear (out, in)
            new[key] = torch.randn(value.shape, generator=gen) / np.sqrt(
                value.shape[1]
            )
        elif key.endswith((".weight",)) and value.ndim == 1:  # norm scale
            new[key] = torch.rand(value.shape, generator=gen) + 0.5
        else:  # biases, 1-d buffers
            new[key] = torch.randn(value.shape, generator=gen) * 0.1
    module.load_state_dict(new)


# Geometry shared by the tests: 64x64 visual crops, (64, 256) audio
# spectrograms -> tower time axis T' = 8 = attention window; audio_length
# 1.28 s gives round(1.28 * 25/4) = 8 (reference model.py:60-61).
H = W = 64
AF, AT = 64, 256
ATTN_WIN = 8
AUDIO_LENGTH = 1.28


def make_ref_cfg(attention_type="mha", enable=True, use_pe=True,
                 use_fixed=False, num_classes=None, fusion_dropout=0.5,
                 freeze_base=False):
    return NS(
        model=NS(
            arch="bninception",
            num_classes=num_classes or {"verb": 7, "noun": 9},
            attention=NS(
                enable=enable,
                type=attention_type,
                use_fixed=use_fixed,
                use_pe=use_pe,
                attn_heads=4,
                attn_dropout=0.5,
                use_gumbel=True,
            ),
            agg_type="avg",
            freeze_base=freeze_base,
            freeze_mode="partialbn",
            fusion_dropout=fusion_dropout,
            resnet=NS(depth=50),
            vgg=NS(type="16"),
        ),
        data=NS(audio=NS(audio_length=AUDIO_LENGTH, dropout=0.0)),
    )


def make_oracle(modality, attention_type="mha", enable=True, use_pe=True,
                seed=0, fusion_dropout=0.5, freeze_base=False,
                num_classes=None):
    mods = load_reference_models()
    ref_model = mods["refmodels.model"]
    ref_audio = mods["refmodels.bn_inception_audio"]

    class OracleTBN(ref_model.TBNModel):
        """Reference TBNModel with the tower factory swapped for the
        self-contained BNInception_Audio graph (visual stems widened to the
        modality's channel count). Everything else — __init__ wiring,
        forward, _aggregate_scores — is the reference's own code."""

        def _create_base_model(self, m):
            attend = (m == "Audio") and self.use_attention
            tower = ref_audio.BNInception_Audio(attend=attend)
            in_ch = {"RGB": 3, "Flow": 10, "Audio": 1}[m]
            if in_ch != 1:
                tower.conv1_1x3_s2 = nn.Conv2d(
                    in_ch, 32, kernel_size=(3, 1), stride=(2, 2), padding=(1, 0)
                )
                tower.conv1_3x1_s2 = nn.Conv2d(
                    in_ch, 32, kernel_size=(1, 3), stride=(2, 2), padding=(0, 1)
                )
            tower.feature_size = 1024
            return tower

    cfg = make_ref_cfg(attention_type=attention_type, enable=enable,
                       use_pe=use_pe, fusion_dropout=fusion_dropout,
                       freeze_base=freeze_base, num_classes=num_classes)
    oracle = OracleTBN(cfg, list(modality), torch.device("cpu"))
    randomize_state_dict(oracle, seed=seed)
    return oracle.eval()


def make_ours(modality, attention_type="mha", enable=True, use_pe=True,
              fusion_dropout=0.5):
    spec = TBNSpec(
        modality=tuple(modality),
        arch="bninception",
        num_classes=(("verb", 7), ("noun", 9)),
        attention_enable=enable,
        attention_type=attention_type,
        use_pe=use_pe,
        attn_heads=4,
        attn_win=ATTN_WIN,
        audio_stem=tuple(modality),  # all towers on the verbatim-graph stem
        audio_from_waveform=False,
        fusion_dropout=fusion_dropout,
        compute_dtype="float32",
    )
    return TBNModel(spec)


def torch_batch(modality, b=2, n=2, seed=1, crops=1):
    gen = torch.Generator().manual_seed(seed)
    batch = {}
    if "RGB" in modality:
        batch["RGB"] = torch.randn(b, n * crops, 3, H, W, generator=gen)
    if "Flow" in modality:
        batch["Flow"] = torch.randn(b, n * crops, 10, H, W, generator=gen)
    if "Audio" in modality:
        batch["Audio"] = torch.randn(b, n, 1, AF, AT, generator=gen)
    return batch


def to_jax_batch(batch):
    out = {}
    for key, value in batch.items():
        arr = value.numpy()
        # NCHW -> NHWC on the per-frame dims
        out[key] = jnp.asarray(np.transpose(arr, (0, 1, 3, 4, 2)))
    return out


def apply_ours(model, tbatch, oracle):
    params, stats = convert_tbn_checkpoint(
        {k: v for k, v in oracle.state_dict().items()}, arch="bninception"
    )
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    jbatch = to_jax_batch(tbatch)
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    return fn(variables, jbatch)


# ---------------------------------------------------------------------------
# Tower-level parity: the verbatim reference inception graph
# ---------------------------------------------------------------------------


class TestTowerParity:
    def test_bn_inception_train_mode(self):
        """TRAIN-mode parity against torch: live BatchNorm statistics.

        Exercises the merged train-time conv+BN, the avg-pool/proj
        commutation and the bias-cancellation-through-BN rewrite against
        the reference tower run verbatim in .train() — outputs AND the
        updated running statistics must match (the towers contain no
        dropout, so train mode is deterministic)."""
        mods = load_reference_models()
        ref = mods["refmodels.bn_inception_audio"].BNInception_Audio(
            attend=False
        )
        randomize_state_dict(ref, seed=5)
        ref = ref.train()

        x = torch.randn(3, 1, AF, AT, generator=torch.Generator().manual_seed(9))
        with torch.no_grad():
            want = ref(x).numpy()
        want_stats = {
            k: v.numpy().copy()
            for k, v in ref.state_dict().items()
            if k.endswith(("running_mean", "running_var"))
        }

        # rebuild the un-updated state dict for conversion (torch already
        # mutated the stats above, so re-randomize)
        ref2 = mods["refmodels.bn_inception_audio"].BNInception_Audio(
            attend=False
        )
        randomize_state_dict(ref2, seed=5)
        params, stats = convert_bninception(ref2.state_dict())

        ours_model = BNInception(audio_stem=True)
        got, mutated = ours_model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
            train=True,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=5e-4, atol=5e-4
        )

        # running statistics after one train step must match torch's
        new_stats = mutated["batch_stats"]

        def flat(tree, prefix=""):
            out = {}
            for key, value in tree.items():
                path = f"{prefix}{key}"
                if isinstance(value, dict):
                    out.update(flat(value, path + "/"))
                else:
                    out[path] = np.asarray(value)
            return out

        ours_stats = flat(new_stats)
        checked = 0
        for tkey, tval in want_stats.items():
            # torch "<layer>_bn.running_*" -> ours "<block>/<cell>/bn/*"
            stat = "mean" if tkey.endswith("running_mean") else "var"
            base = tkey.rsplit("_bn.", 1)[0]
            if base.startswith("inception_"):
                jkey = f"{base[:12]}/{base[13:]}/bn/{stat}"
            else:
                jkey = f"{base}/bn/{stat}"
            assert jkey in ours_stats, (tkey, jkey)
            np.testing.assert_allclose(
                ours_stats[jkey], tval, rtol=5e-4, atol=5e-4, err_msg=tkey
            )
            checked += 1
        assert checked > 60, f"only {checked} stat tensors compared"

    @pytest.mark.parametrize("attend", [False, True])
    def test_bn_inception_graph(self, attend):
        mods = load_reference_models()
        ref = mods["refmodels.bn_inception_audio"].BNInception_Audio(
            attend=attend
        )
        randomize_state_dict(ref, seed=3)
        ref = ref.eval()

        x = torch.randn(2, 1, AF, AT, generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            want = ref(x).numpy()

        params, stats = convert_bninception(ref.state_dict())
        ours_model = BNInception(freq_pool_only=attend, audio_stem=True)
        got = jax.jit(
            lambda v, x: ours_model.apply(v, x, train=False)
        )({"params": params, "batch_stats": stats}, jnp.asarray(
            np.transpose(x.numpy(), (0, 2, 3, 1))
        ))

        got = np.asarray(got)
        if attend:
            # reference (B, 1024, 1, T) vs ours (B, T, 1024)
            want = np.transpose(want[:, :, 0, :], (0, 2, 1))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Full-model parity: the reference's own TBNModel.forward
# ---------------------------------------------------------------------------


def assert_outputs_match(got, oracle_out, rtol=3e-4, atol=3e-4):
    for key in ("verb", "noun"):
        np.testing.assert_allclose(
            np.asarray(got[key]),
            oracle_out[key].numpy(),
            rtol=rtol,
            atol=atol,
            err_msg=f"head {key}",
        )
    if "weights" in oracle_out and "weights" in got:
        np.testing.assert_allclose(
            np.asarray(got["weights"]).reshape(-1),
            oracle_out["weights"].numpy().reshape(-1),
            rtol=rtol,
            atol=atol,
            err_msg="attention weights",
        )


class TestFullModelParity:
    @pytest.mark.parametrize("attention_type", ["mha", "unimodal", "proto"])
    def test_rgb_audio_attention(self, attention_type):
        modality = ("RGB", "Audio")
        oracle = make_oracle(modality, attention_type=attention_type)
        tbatch = torch_batch(modality)
        with torch.no_grad():
            want = oracle({k: v.clone() for k, v in tbatch.items()})

        ours = make_ours(modality, attention_type=attention_type)
        got = apply_ours(ours, tbatch, oracle)
        assert_outputs_match(got, want)

    def test_trimodal_no_attention(self):
        modality = ("RGB", "Flow", "Audio")
        oracle = make_oracle(modality, enable=False)
        tbatch = torch_batch(modality)
        with torch.no_grad():
            want = oracle({k: v.clone() for k, v in tbatch.items()})

        ours = make_ours(modality, enable=False)
        got = apply_ours(ours, tbatch, oracle)
        assert_outputs_match(got, want)

    def _run_training_dynamics(self, oracle, modality, freeze_base,
                               lr, momentum, wd, clip, steps,
                               optim_type="sgd"):
        """Drive `steps` full optimizer updates through BOTH the reference's
        verbatim training loop (core/tools/train.py:69-99 with
        accumulator_step=1) and our jitted train step, on IDENTICAL batches,
        and assert the two-tier parity contract:

        * TIGHT, after step 1 — every updated parameter and running
          statistic at fp32 tolerance. One step has no chaotic
          amplification, so this catches update-semantics bugs outright
          (clip-vs-weight-decay ordering, momentum-buffer init, BN EMA
          momentum, lr plumbing, freeze masks).
        * CHAOS-SCALED, over the trajectory — this training system is
          measurably chaotic: perturbing ONE stem conv weight of the
          pure-torch loop by 1e-6 moves the per-step total losses by
          relative [1.1e-5, 1.3e-4, 4.3e-4] (Lyapunov factor ~30x/step),
          so cross-backend fp32 conv noise lawfully grows to ~1e-3 by
          step 3. Per-step loss tolerances below are that measured
          envelope with ~5x headroom; a genuine semantics bug (wrong
          momentum decay, clipped weight decay, stale BN stats) lands
          orders of magnitude outside it.

        Returns (initial (params, stats), final TrainState) for
        caller-specific assertions. clip must be small enough that the
        clip path actually fires (asserted)."""
        # convert the INITIAL weights before torch mutates them in place
        params, stats = convert_tbn_checkpoint(
            {k: v.clone() for k, v in oracle.state_dict().items()},
            arch="bninception",
        )
        initial = (params, stats)

        gen = torch.Generator().manual_seed(42)
        batches = [torch_batch(modality, b=2, n=2, seed=100 + k)
                   for k in range(steps)]
        targets_t = {
            "class": {
                "verb": torch.randint(0, 7, (2,), generator=gen),
                "noun": torch.randint(0, 9, (2,), generator=gen),
            }
        }

        # --- reference loop (verbatim semantics) --------------------------
        if optim_type == "adam":
            # reference core/tools/train.py:203-209
            opt = torch.optim.Adam(
                oracle.parameters(), lr, betas=(0.9, 0.999), weight_decay=wd
            )
        else:
            opt = torch.optim.SGD(
                oracle.parameters(), lr, momentum=momentum, weight_decay=wd
            )
        criterion = {"crossentropy": nn.CrossEntropyLoss()}
        want_losses = []
        want_after_step1 = None
        clipped = False
        for k in range(steps):
            opt.zero_grad()
            out = oracle({key: v.clone() for key, v in batches[k].items()})
            loss, _ = oracle.get_loss(criterion, targets_t, out)
            loss["total"].backward()
            norm = torch.nn.utils.clip_grad_norm_(oracle.parameters(), clip)
            clipped = clipped or float(norm) > clip
            opt.step()
            want_losses.append(float(loss["total"].detach()))
            if k == 0:
                want_after_step1 = convert_tbn_checkpoint(
                    {key: v.clone() for key, v in oracle.state_dict().items()},
                    arch="bninception",
                )
        assert clipped, "clip_grad never fired — weak test, lower clip"

        # --- our jitted train step ----------------------------------------
        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.parallel.optim import build_optimizer
        from attention_based_tbn_tpu.parallel.train_step import (
            TrainState,
            make_train_step,
        )

        cfg = load_config(
            overrides=[
                "model.pretrained=False",
                "model.attention.enable=False",
                "model.num_classes={verb: 7, noun: 9}",
                f"model.freeze_base={freeze_base}",
                "model.freeze_mode=partialbn",
                f"train.optim.type={optim_type}",
                f"train.optim.lr={lr}",
                f"train.optim.momentum={momentum}",
                f"train.optim.weight_decay={wd}",
                "train.optim.accumulator_step=1",
                f"train.clip_grad={clip}",
            ]
        )
        ours = make_ours(modality, enable=False, fusion_dropout=0.0)
        tx, _ = build_optimizer(cfg, params, list(modality))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=tx.init(params),
        )
        step_fn = make_train_step(ours, tx, cfg, mesh=None)

        jtargets = {
            "class": {
                k: jnp.asarray(v.numpy()) for k, v in targets_t["class"].items()
            }
        }
        def is_convbn_bias(path):
            # PARITY.md divergence 3: conv biases under live BN have a
            # mathematically-zero gradient that we compute exactly while
            # torch computes fp32 noise. SGD turns the noise into
            # negligible updates, but Adam's per-element normalization
            # turns it into sign-driven O(lr) random-walk steps — on a
            # parameter with NO effect on model outputs (BN cancels it).
            # Excluded from the parameter comparison on both tiers.
            keys = [getattr(p, "key", None) for p in path]
            return (keys and keys[-1] == "bias" and "conv" in keys
                    and str(keys[0]).startswith("Base_"))

        def compare_trees(got, want, what, rtol, atol,
                          outlier_frac=0.0, outlier_bound=0.0):
            """Elementwise allclose over the tree, with an optional budget
            of bounded outliers. Adam's step-1 update is lr*sign(g) for ANY
            gradient above eps, so elements whose true gradient is ~0 take
            a full +/-lr step in a backend-noise-chosen direction: isolated
            cross-backend sign flips of magnitude <= the Adam step quantum
            are inherent, not a semantics bug. outlier_frac caps how many
            elements may exceed (rtol, atol); outlier_bound caps each such
            element's absolute difference at the step-quantum bound."""
            flat_got = jax.tree_util.tree_flatten_with_path(got)
            flat_want = jax.tree_util.tree_flatten_with_path(want)
            assert flat_got[1] == flat_want[1], f"{what}: tree mismatch"
            count, total, n_out = 0, 0, 0
            for (path, g), (_, w) in zip(flat_got[0], flat_want[0]):
                if is_convbn_bias(path):
                    continue
                g, w = np.asarray(g), np.asarray(w)
                if outlier_frac == 0.0:
                    np.testing.assert_allclose(
                        g, w, rtol=rtol, atol=atol,
                        err_msg=f"{what} {jax.tree_util.keystr(path)}",
                    )
                else:
                    diff = np.abs(g - w)
                    viol = diff > (atol + rtol * np.abs(w))
                    assert diff[viol].max(initial=0.0) <= outlier_bound, (
                        f"{what} {jax.tree_util.keystr(path)}: outlier "
                        f"{diff[viol].max():.3e} > bound {outlier_bound:.3e}"
                    )
                    n_out += int(viol.sum())
                    total += g.size
                count += 1
            if outlier_frac:
                assert n_out <= outlier_frac * total, (
                    f"{what}: {n_out}/{total} outliers exceeds "
                    f"budget {outlier_frac:.2%}"
                )
            return count

        got_losses = []
        for k in range(steps):
            state, loss, _ = step_fn(
                state, to_jax_batch(batches[k]), jtargets,
                jax.random.key(0), jnp.asarray(0), 2,
            )
            got_losses.append(float(loss["total"]))
            if k == 0:
                # TIGHT tier: full state after ONE update, no amplification.
                # atol floor 1e-4: cross-backend conv-backward noise on the
                # largest grads reaches ~5e-5 absolute after lr scaling; a
                # real update bug moves stem elements by O(update)~1e-3+.
                # Adam gets a 2% budget of sign-flip outliers bounded by
                # the per-step quantum (see compare_trees docstring).
                adam = optim_type == "adam"
                n_params = compare_trees(
                    state.params, want_after_step1[0], "step1 param",
                    rtol=1e-3, atol=1e-4,
                    outlier_frac=0.02 if adam else 0.0,
                    outlier_bound=2.2 * lr if adam else 0.0,
                )
                n_stats = compare_trees(
                    state.batch_stats, want_after_step1[1], "step1 stat",
                    rtol=1e-3, atol=1e-4,
                )
                assert n_params > 200 and n_stats > 100, (n_params, n_stats)

        # CHAOS-SCALED tier: measured noise envelope (docstring) x ~5.
        # Adam is far coarser past step 0: its first update is +/-lr on
        # EVERY element, so the ~1-2% backend-noise sign-flip set displaces
        # the model by ||delta|| ~ lr*sqrt(0.02*N) before step 1's forward;
        # the semantics contract lives in the param-state compares.
        loss_tols = ((1e-4, 5e-2, 1e-1) if optim_type == "adam"
                     else (1e-4, 1e-3, 5e-3))
        for k, (got, want) in enumerate(zip(got_losses, want_losses)):
            np.testing.assert_allclose(
                got, want, rtol=loss_tols[k], err_msg=f"loss at step {k}"
            )

        # Final state, at the same chaos-scaled envelope.
        params_want, stats_want = convert_tbn_checkpoint(
            {k: v.clone() for k, v in oracle.state_dict().items()},
            arch="bninception",
        )
        adam = optim_type == "adam"
        compare_trees(state.params, params_want, "param", rtol=5e-3, atol=5e-4,
                      outlier_frac=0.03 if adam else 0.0,
                      outlier_bound=2.2 * lr * steps if adam else 0.0)
        # atol 2e-3: near-zero deep-layer batch means carry the full chaos
        # envelope as absolute error; an EMA bug would be O(0.1).
        compare_trees(state.batch_stats, stats_want, "stat",
                      rtol=1e-2, atol=2e-3,
                      outlier_frac=0.03 if adam else 0.0,
                      outlier_bound=2.2 * lr * steps if adam else 0.0)
        return initial, state

    def test_training_dynamics_parity(self):
        """Three full optimizer steps, every parameter trainable: SGD +
        momentum + weight decay + global-norm clip + live BN statistics
        against the reference's verbatim loop (see _run_training_dynamics
        for the two-tier tolerance contract)."""
        modality = ("RGB", "Audio")
        oracle = make_oracle(modality, enable=False, fusion_dropout=0.0)
        self._run_training_dynamics(
            oracle.train(), modality, freeze_base=False,
            lr=0.05, momentum=0.9, wd=1e-4, clip=1.0, steps=3,
        )

    @pytest.mark.slow
    def test_partialbn_training_dynamics_parity(self):
        """Two full optimizer steps with freeze_base=True partialbn: the
        reference freezes BN affine params via requires_grad=False
        (model.py:148-176) — torch then excludes them from BOTH the update
        and clip_grad_norm_'s global norm, while their running statistics
        keep updating in train mode. Our side expresses the same thing as
        optax.multi_transform freeze masks, whose partitioning must also
        exclude frozen leaves from clip_by_global_norm.

        Also pins the reference's as-written freeze set on the two-branch
        audio stem: the `(modality == "Audio" and mod_no > 6)` clause is
        DEAD CODE (`or mod_no > 1` short-circuits it), so only child index
        1's BN (conv1_1x3_s2_bn) stays trainable and conv1_3x1_s2_bn is
        frozen — asserted on the torch side from requires_grad and on our
        side from the actual update."""
        modality = ("RGB", "Audio")
        oracle = make_oracle(
            modality, enable=False, fusion_dropout=0.0, freeze_base=True
        ).train()

        # the as-written reference freeze set, read off requires_grad
        frozen = {n for n, p in oracle.named_parameters()
                  if not p.requires_grad}
        assert "Base_RGB.conv1_1x3_s2_bn.weight" not in frozen
        assert "Base_RGB.conv1_3x1_s2_bn.weight" in frozen  # dead Audio clause
        assert "Base_Audio.conv1_3x1_s2_bn.weight" in frozen
        assert "Base_Audio.conv2_3x3_bn.weight" in frozen
        assert not any(n.startswith("fusion") or n.startswith("classifier")
                       for n in frozen)

        (params0, stats0), state = self._run_training_dynamics(
            oracle, modality, freeze_base=True,
            lr=0.05, momentum=0.9, wd=1e-4, clip=1.0, steps=2,
        )

        def leaf(tree, *path):
            node = tree
            for key in path:
                node = node[key]
            return np.asarray(node)

        for tower in ("Base_RGB", "Base_Audio"):
            # frozen BN affine: bitwise-unchanged through 2 updates
            np.testing.assert_array_equal(
                leaf(state.params, tower, "conv1_3x1_s2", "bn", "scale"),
                leaf(params0, tower, "conv1_3x1_s2", "bn", "scale"),
            )
            np.testing.assert_array_equal(
                leaf(state.params, tower, "inception_3a", "1x1", "bn", "bias"),
                leaf(params0, tower, "inception_3a", "1x1", "bn", "bias"),
            )
            # trainable stem BN and convs: actually updated
            assert not np.array_equal(
                leaf(state.params, tower, "conv1_1x3_s2", "bn", "scale"),
                leaf(params0, tower, "conv1_1x3_s2", "bn", "scale"),
            )
            assert not np.array_equal(
                leaf(state.params, tower, "conv1_3x1_s2", "conv", "kernel"),
                leaf(params0, tower, "conv1_3x1_s2", "conv", "kernel"),
            )
            # frozen BN running stats STILL update (train mode, no eval())
            assert not np.array_equal(
                leaf(state.batch_stats, tower, "conv1_3x1_s2", "bn", "mean"),
                leaf(stats0, tower, "conv1_3x1_s2", "bn", "mean"),
            )

    @pytest.mark.slow
    def test_adam_training_dynamics_parity(self):
        """ONE full Adam update against the reference's construction
        (core/tools/train.py:203-209: betas (0.9, 0.999), torch-default
        eps 1e-8, COUPLED L2 weight decay folded into the gradient before
        the moment updates — not AdamW). One step is the whole-model limit
        for Adam: its update is lr*sign(g) for every element, so after the
        backend-noise sign-flip set (~1.4% of 21.5M elements) displaces the
        model, a majority of step-2 tiny-gradient signs are pure noise —
        measured 63% elementwise divergence at step 2, uninformative. A
        construction bug still fails loudly here (e.g. missing bias
        correction scales EVERY update 3.16x at t=1, busting the 2%
        outlier budget). Multi-step Adam moment dynamics are validated
        exactly, chain-only, in tests/test_train_helpers.py
        TestTorchOptimizerChainDifferential."""
        modality = ("RGB", "Audio")
        oracle = make_oracle(modality, enable=False, fusion_dropout=0.0)
        self._run_training_dynamics(
            oracle.train(), modality, freeze_base=False,
            lr=0.01, momentum=0.0, wd=1e-4, clip=1.0, steps=1,
            optim_type="adam",
        )

    def test_ten_crop_alignment(self):
        """10-crop eval pairs each visual crop row with the SAME sample and
        segment's audio feature. Oracle: the reference model fed audio
        pre-expanded to one window per crop row in the ten_crop row order
        (loc-major, orig/flip innermost) — correct pairing by construction,
        no repeat triggered. Ours: unexpanded audio through the 10-crop
        broadcast path (models/tbn.py). Per-segment-distinct audio makes any
        misalignment change the logits."""
        modality = ("RGB", "Audio")
        b, n, crops = 2, 2, 10
        oracle = make_oracle(modality, enable=False)
        tbatch = torch_batch(modality, b=b, n=n, crops=crops)

        audio = tbatch["Audio"]  # (b, n, 1, F, T), distinct per segment
        # ten_crop row order: index = loc*2N + seg*2 + flip
        expanded = (
            audio[:, None, :, None]  # (b, 1, n, 1, ...)
            .expand(b, crops // 2, n, 2, 1, AF, AT)
            .reshape(b, crops * n, 1, AF, AT)
        )
        with torch.no_grad():
            want = oracle({"RGB": tbatch["RGB"].clone(), "Audio": expanded})

        ours = make_ours(modality, enable=False)
        got = apply_ours(ours, tbatch, oracle)
        assert_outputs_match(got, want)
