"""Regression tests for the round-3 continuation review findings.

* The Pallas PE dispatch must slice the positional-encoding table to the
  input's sequence length, like the jnp concat/add paths (the kernel's
  contract is pe_table: (S, D)) — previously it passed the full
  (max_len, D) table and crashed for s != max_len.
* pallas_active is TPU-only (the kernels use pltpu VMEM block specs); any
  other backend takes the jnp composition.
* convert_back emits fresh-BatchNorm running stats (mean 0, var 1) when
  exporting params without batch statistics instead of KeyErroring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_based_tbn_tpu.models.attention import PositionalEncoding
from attention_based_tbn_tpu.ops import pallas_kernels


class TestPallasPETableSlicing:
    def test_module_slices_table_to_sequence_length(self, monkeypatch):
        """s < max_len through the use_pallas dispatch: the kernel must
        receive a (s, D) table and produce the jnp path's output."""
        s, b, c, d, max_len = 8, 3, 128, 10, 25
        captured = {}

        def fake_pe_block(x, pe_table, conv_k, conv_b, gn_scale, gn_bias,
                          num_groups=64, eps=1e-5, interpret=False):
            captured["table_shape"] = tuple(pe_table.shape)
            return pallas_kernels.pe_block_reference(
                x, pe_table, conv_k, conv_b, gn_scale, gn_bias,
                num_groups=num_groups, eps=eps,
            )

        monkeypatch.setattr(pallas_kernels, "pe_block_pallas", fake_pe_block)

        module_pallas = PositionalEncoding(
            dim_size=d, max_len=max_len, out_features=c, num_groups=16,
            use_pallas=True,
        )
        module_jnp = PositionalEncoding(
            dim_size=d, max_len=max_len, out_features=c, num_groups=16,
            use_pallas=False,
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, s, c)), jnp.float32
        )
        variables = module_jnp.init(jax.random.key(0), x)

        want = module_jnp.apply(variables, x, train=False)
        got = module_pallas.apply(variables, x, train=False)

        assert captured["table_shape"] == (s, d)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_kernel_reference_agrees_for_short_sequence(self):
        """pe_block_pallas itself (interpret mode) on a sliced table for
        s < the anchor window."""
        s, b, c_in, c_out, d = 8, 4, 64, 64, 10
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((b, s, c_in)), jnp.float32)
        table = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)
        conv_k = jnp.asarray(
            rng.standard_normal((c_in + d, c_out)) * 0.05, jnp.float32
        )
        conv_b = jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c_out), jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(c_out), jnp.float32)

        want = pallas_kernels.pe_block_reference(
            x, table, conv_k, conv_b, scale, bias, num_groups=16
        )
        got = pallas_kernels.pe_block_pallas(
            x, table, conv_k, conv_b, scale, bias, num_groups=16,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_pallas_active_requires_tpu_backend():
    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

    cfg = load_config(overrides=["tpu.use_pallas=True", "model.pretrained=False"])
    spec = TBNSpec.from_config(cfg, ["RGB", "Audio"])
    model = TBNModel(spec)
    assert spec.use_pallas
    # the test suite runs on the cpu backend: the jnp path must be active
    assert jax.default_backend() != "tpu"
    assert model.pallas_active is False


def test_convert_back_emits_fresh_bn_stats_without_batch_stats():
    from attention_based_tbn_tpu.models.bn_inception import BNInception
    from attention_based_tbn_tpu.models.convert_back import export_bninception

    model = BNInception()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()

    sd = export_bninception(variables["params"], stats=None)
    mean = sd["conv1_7x7_s2_bn.running_mean"]
    var = sd["conv1_7x7_s2_bn.running_var"]
    np.testing.assert_array_equal(mean, np.zeros_like(mean))
    np.testing.assert_array_equal(var, np.ones_like(var))
    # with stats present the real values are emitted (regression guard)
    stats = jax.tree.map(
        lambda a: a + 0.25 if a.ndim else a, variables["batch_stats"]
    )
    sd2 = export_bninception(variables["params"], stats)
    np.testing.assert_allclose(
        sd2["conv1_7x7_s2_bn.running_var"],
        np.asarray(stats["conv1_7x7_s2"]["bn"]["var"]),
    )
