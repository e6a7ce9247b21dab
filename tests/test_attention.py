"""Attention-module parity against torch and reference semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.models.attention import (
    MultiheadAttention,
    PositionalEncoding,
    PrototypeAttention,
    UniModalAttention,
    gumbel_softmax,
    positional_encoding_table,
)


def t2j(tensor):
    return jnp.asarray(np.array(tensor.detach().numpy()))


class TestPositionalEncodingTable:
    def test_product_form(self):
        # reference attention.py:26-30: position x frequency-index products
        table = positional_encoding_table(10, 13)
        assert table.shape == (13, 10)
        pos = np.arange(13)[:, None] * np.arange(1, 6)[None, :]
        np.testing.assert_allclose(table[:, 0::2], np.sin(pos), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(table[:, 1::2], np.cos(pos), rtol=1e-5, atol=1e-6)

    def test_pe_block_matches_torch(self):
        torch.manual_seed(0)
        s, b, c, d = 13, 4, 1024, 10
        conv = torch.nn.Conv1d(c + d, c, kernel_size=1)
        gn = torch.nn.GroupNorm(64, c)

        x = torch.randn(b, c, s)
        pe = torch.from_numpy(positional_encoding_table(d, s).T[None])  # (1, d, s)
        ref_in = torch.cat((x, pe.expand(b, d, s)), dim=1)
        ref = gn(conv(ref_in))

        params = {
            "conv": {
                # Conv1d weight (out, in, 1) -> Linear kernel (in, out)
                "kernel": t2j(conv.weight.squeeze(-1).T),
                "bias": t2j(conv.bias),
            },
            "norm": {"scale": t2j(gn.weight), "bias": t2j(gn.bias)},
        }
        ours = PositionalEncoding(dim_size=d, max_len=s).apply(
            {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1))
        )
        np.testing.assert_allclose(
            np.asarray(ours),
            ref.detach().numpy().transpose(0, 2, 1),
            rtol=5e-4,
            atol=5e-4,
        )


class TestMultiheadAttention:
    def test_matches_torch(self):
        torch.manual_seed(1)
        e, h, b, s = 64, 4, 3, 13
        mha = torch.nn.MultiheadAttention(e, h, dropout=0.0, bias=True)
        mha.eval()

        query = torch.randn(1, b, e)  # (L, B, E)
        key = torch.randn(s, b, e)
        ref_out, ref_wts = mha(query, key, key)

        wq, wk, wv = mha.in_proj_weight.chunk(3)
        bq, bk, bv = mha.in_proj_bias.chunk(3)
        params = {
            "q_proj": {"kernel": t2j(wq.T), "bias": t2j(bq)},
            "k_proj": {"kernel": t2j(wk.T), "bias": t2j(bk)},
            "v_proj": {"kernel": t2j(wv.T), "bias": t2j(bv)},
            "out_proj": {
                "kernel": t2j(mha.out_proj.weight.T),
                "bias": t2j(mha.out_proj.bias),
            },
        }
        ours_out, ours_wts = MultiheadAttention(embed_dim=e, num_heads=h).apply(
            {"params": params},
            jnp.asarray(query.numpy().transpose(1, 0, 2)),
            jnp.asarray(key.numpy().transpose(1, 0, 2)),
            jnp.asarray(key.numpy().transpose(1, 0, 2)),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(ours_out),
            ref_out.detach().numpy().transpose(1, 0, 2),
            rtol=1e-4,
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ours_wts), ref_wts.detach().numpy(), rtol=1e-4, atol=1e-5
        )

    def test_weights_sum_to_one(self):
        model = MultiheadAttention(embed_dim=32, num_heads=4)
        q = jnp.ones((2, 1, 32))
        k = jnp.ones((2, 7, 32))
        params = model.init(jax.random.key(0), q, k, k)["params"]
        _, wts = model.apply({"params": params}, q, k, k)
        np.testing.assert_allclose(np.asarray(wts.sum(-1)), 1.0, rtol=1e-5)


class TestGumbelSoftmax:
    def test_hard_one_hot(self):
        logits = jnp.asarray(np.random.default_rng(0).standard_normal((8, 13)))
        y = np.asarray(gumbel_softmax(logits, jax.random.key(0), hard=True))
        np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-5)
        # forward value is (numerically) one-hot: max ~1, rest ~0
        np.testing.assert_allclose(np.sort(y, axis=-1)[:, -1], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.sort(y, axis=-1)[:, :-1], 0.0, atol=1e-5)

    def test_soft_gradient_flows(self):
        logits = jnp.zeros((2, 5))

        def f(lg):
            return gumbel_softmax(lg, jax.random.key(1), hard=True).sum(axis=-1).sum()

        grads = jax.grad(f)(logits)
        assert np.asarray(jnp.abs(grads)).sum() >= 0  # straight-through defined


class TestUniModal:
    def test_eval_softmax_weighted_sum(self):
        b, s, c = 4, 13, 32
        model = UniModalAttention(win_size=s, hidden_size=16)
        rgb = jnp.asarray(np.random.default_rng(0).standard_normal((b, c)), jnp.float32)
        audio = jnp.asarray(
            np.random.default_rng(1).standard_normal((b, s, c)), jnp.float32
        )
        params = model.init(jax.random.key(0), rgb, audio)["params"]
        out, wts = model.apply({"params": params}, rgb, audio, train=False)
        assert out.shape == (b, c)
        assert wts.shape == (b, s)
        np.testing.assert_allclose(np.asarray(wts.sum(-1)), 1.0, rtol=1e-5)
        manual = np.einsum("bsc,bs->bc", np.asarray(audio), np.asarray(wts))
        np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-4, atol=1e-5)

    def test_train_gumbel_one_hot(self):
        b, s, c = 4, 13, 32
        model = UniModalAttention(win_size=s, hidden_size=16, use_gumbel=True)
        rgb = jnp.ones((b, c))
        audio = jnp.ones((b, s, c))
        params = model.init(jax.random.key(0), rgb, audio)["params"]
        out, wts = model.apply(
            {"params": params}, rgb, audio, train=True, rngs={"gumbel": jax.random.key(7)}
        )
        w = np.sort(np.asarray(wts), axis=-1)
        np.testing.assert_allclose(w[:, -1], 1.0, atol=1e-5)
        np.testing.assert_allclose(w[:, :-1], 0.0, atol=1e-5)


class TestPrototype:
    def test_prototype_curves(self):
        model = PrototypeAttention(win_size=13)
        protos = model.prototypes()
        assert protos.shape == (3, 13)
        # centred, rolled -4, rolled +4 (shift = 13//2 - 2 = 4)
        assert np.argmax(protos[0]) == 6
        assert np.argmax(protos[1]) == 2
        assert np.argmax(protos[2]) == 10
        np.testing.assert_allclose(protos.sum(1), 1.0, rtol=1e-5)

    def test_eval_forward(self):
        b, s, c = 2, 13, 16
        model = PrototypeAttention(win_size=s, hidden_size=8)
        rgb = jnp.asarray(np.random.default_rng(3).standard_normal((b, c)), jnp.float32)
        audio = jnp.asarray(
            np.random.default_rng(4).standard_normal((b, s, c)), jnp.float32
        )
        params = model.init(jax.random.key(0), rgb, audio)["params"]
        out, wts = model.apply({"params": params}, rgb, audio, train=False)
        assert out.shape == (b, c)
        assert wts.shape == (b, s)
        # weights are convex combos of normalized prototypes -> sum to 1
        np.testing.assert_allclose(np.asarray(wts.sum(-1)), 1.0, rtol=1e-5)
