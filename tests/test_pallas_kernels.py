"""Pallas kernel parity tests (interpret mode on CPU) against the jnp
reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.ops.pallas_kernels import (
    consensus_heads_pallas,
    consensus_heads_reference,
    mha_pallas,
    mha_reference,
    pe_block_pallas,
    pe_block_reference,
)
from attention_based_tbn_tpu.models.attention import positional_encoding_table

RNG = np.random.default_rng(0)


def test_pe_block_matches_reference():
    b, s, c, d = 3, 13, 256, 10
    x = jnp.asarray(RNG.standard_normal((b, s, c)), jnp.float32)
    table = jnp.asarray(positional_encoding_table(d, s))
    w = jnp.asarray(RNG.standard_normal((c + d, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.standard_normal(c) * 0.1, jnp.float32)
    scale = jnp.asarray(RNG.random(c) + 0.5, jnp.float32)
    gn_bias = jnp.asarray(RNG.standard_normal(c) * 0.1, jnp.float32)

    ref = np.asarray(
        pe_block_reference(x, table, w, bias, scale, gn_bias, num_groups=64)
    )
    ours = np.asarray(
        pe_block_pallas(x, table, w, bias, scale, gn_bias, num_groups=64,
                        interpret=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pe_block_matches_flax_module():
    """And the jnp reference itself matches the Flax PositionalEncoding."""
    from attention_based_tbn_tpu.models.attention import PositionalEncoding

    b, s, c, d = 2, 13, 128, 10
    x = jnp.asarray(RNG.standard_normal((b, s, c)), jnp.float32)
    module = PositionalEncoding(dim_size=d, max_len=s, out_features=c, num_groups=32)
    variables = module.init(jax.random.key(0), x)
    ref = np.asarray(module.apply(variables, x))

    params = variables["params"]
    ours = np.asarray(
        pe_block_reference(
            x,
            jnp.asarray(positional_encoding_table(d, s)),
            params["conv"]["kernel"],
            params["conv"]["bias"],
            params["norm"]["scale"],
            params["norm"]["bias"],
            num_groups=32,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestMHA:
    def _params(self, e):
        mk = lambda shape: jnp.asarray(RNG.standard_normal(shape) * 0.05, jnp.float32)
        return dict(
            wq=mk((e, e)), bq=mk(e), wk=mk((e, e)), bk=mk(e),
            wv=mk((e, e)), bv=mk(e), wo=mk((e, e)), bo=mk(e),
        )

    def test_matches_reference(self):
        b, s, e, h = 4, 13, 128, 4
        p = self._params(e)
        q = jnp.asarray(RNG.standard_normal((b, e)), jnp.float32)
        kv = jnp.asarray(RNG.standard_normal((b, s, e)), jnp.float32)

        ref_out, ref_wts = mha_reference(q, kv, num_heads=h, **p)
        out, wts = mha_pallas(q, kv, num_heads=h, interpret=True, **p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(wts), np.asarray(ref_wts),
                                   rtol=1e-4, atol=1e-5)

    def test_reference_matches_flax_module(self):
        from attention_based_tbn_tpu.models.attention import MultiheadAttention

        b, s, e, h = 3, 8, 64, 4
        q = jnp.asarray(RNG.standard_normal((b, 1, e)), jnp.float32)
        kv = jnp.asarray(RNG.standard_normal((b, s, e)), jnp.float32)
        module = MultiheadAttention(embed_dim=e, num_heads=h, dropout_rate=0.0)
        variables = module.init(jax.random.key(0), q, kv, kv)
        flax_out, flax_wts = module.apply(variables, q, kv, kv, train=False)

        params = variables["params"]
        ref_out, ref_wts = mha_reference(
            q[:, 0, :], kv,
            wq=params["q_proj"]["kernel"], bq=params["q_proj"]["bias"],
            wk=params["k_proj"]["kernel"], bk=params["k_proj"]["bias"],
            wv=params["v_proj"]["kernel"], bv=params["v_proj"]["bias"],
            wo=params["out_proj"]["kernel"], bo=params["out_proj"]["bias"],
            num_heads=h,
        )
        np.testing.assert_allclose(
            np.asarray(ref_out), np.asarray(flax_out[:, 0, :]), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ref_wts), np.asarray(flax_wts[:, 0, :]), rtol=1e-4, atol=1e-5
        )


def test_consensus_heads():
    b, n, f = 4, 3, 64
    feats = jnp.asarray(RNG.standard_normal((b, n, f)), jnp.float32)
    kernels = [jnp.asarray(RNG.standard_normal((f, c)) * 0.1, jnp.float32)
               for c in (11, 13)]
    biases = [jnp.asarray(RNG.standard_normal(c) * 0.1, jnp.float32)
              for c in (11, 13)]
    ref = consensus_heads_reference(feats, kernels, biases)
    ours = consensus_heads_pallas(feats, kernels, biases, interpret=True)
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-4, atol=1e-5)
