"""Audio-attention modules: the core novelty of the reference framework.

The RGB segment feature queries the audio feature's temporal axis
(reference core/models/attention.py):

* PositionalEncoding — a non-standard sin/cos table over (position x
  frequency-index) products, *concatenated* as 10 extra channels, followed by
  a 1x1 conv back to 1024ch and GroupNorm(64) (reference attention.py:8-45 and
  model.py:62-67);
* MultiheadAttention — torch.nn.MultiheadAttention semantics (packed q/k/v
  projections, scaled dot-product, head-averaged weights, attn-prob dropout);
* UniModalAttention — an MLP on the RGB feature predicts a distribution over
  the audio time axis (gumbel-softmax hard one-hot at train);
* PrototypeAttention — the MLP picks among 3 Gaussian prototype weight
  curves (centred / rolled +-(win//2-2)).

Layouts are batch-first/TPU-native: features (B, C), audio sequence (B, S, C).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.priors import gaussian_kernel
from .layers import TorchGroupNorm, TorchLinear

Dtype = Any


def positional_encoding_table(dim_size: int, max_len: int) -> np.ndarray:
    """(max_len, dim_size) table; pe[p, 2i] = sin(p*(i+1)), pe[p, 2i+1] =
    cos(p*(i+1)) — the reference's product form (attention.py:26-30)."""
    position = np.arange(max_len, dtype=np.float64)[:, None] * np.arange(
        1, dim_size // 2 + 1, dtype=np.float64
    )
    table = np.zeros((max_len, dim_size), dtype=np.float64)
    table[:, 0::2] = np.sin(position)
    table[:, 1::2] = np.cos(position)
    return table.astype(np.float32)


class LinearParams(nn.Module):
    """Declares a (kernel, bias) pair without applying it — lets a parent
    dispatch between the jnp composition and a fused Pallas kernel while
    keeping the converter-compatible parameter tree path."""

    features_in: int
    features_out: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.features_in, self.features_out), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,), jnp.float32)
        return kernel, bias


class AffineParams(nn.Module):
    """(scale, bias) pair for a norm layer, declared without applying."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class PositionalEncoding(nn.Module):
    """Concat-PE + 1x1 conv (1024+dim -> 1024) + GroupNorm(64, 1024).

    With ``use_pallas`` the three stages run as one fused Pallas kernel
    (ops/pallas_kernels.pe_block_pallas) entirely in VMEM.
    """

    dim_size: int = 10
    max_len: int = 25
    out_features: int = 1024
    num_groups: int = 64
    encoding_type: str = "concat"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, S, C)
        b, s, c = x.shape
        table = jnp.asarray(positional_encoding_table(self.dim_size, self.max_len))

        # The fused kernel is deliberately inference-only (no VJP);
        # training uses the jnp composition. Measured (round 3, train-step
        # device trace): the ENTIRE attention path — PE + MHA + gumbel +
        # their backward — is 0.26 ms of a 44 ms step (0.6%), so a custom
        # Pallas VJP has no headroom to pay for itself; XLA's fused
        # backward is already optimal at this scale.
        if self.encoding_type == "concat" and self.use_pallas and not train:
            from ..ops.pallas_kernels import pe_block_pallas

            conv_k, conv_b = LinearParams(
                c + self.dim_size, self.out_features, name="conv"
            )()
            gn_scale, gn_bias = AffineParams(self.out_features, name="norm")()
            # slice to the input's sequence length — same contract as the
            # jnp paths below (the kernel takes pe_table as (S, D))
            return pe_block_pallas(
                x,
                table[:s].astype(x.dtype),
                conv_k.astype(self.dtype),
                conv_b.astype(self.dtype),
                gn_scale.astype(self.dtype),
                gn_bias.astype(self.dtype),
                num_groups=self.num_groups,
            )

        if self.encoding_type == "add":
            x = x + table[None, :s, :c].astype(x.dtype)
        else:  # concat
            # slice the table to the input's sequence length like the add
            # path (s == max_len for the anchor-formula window, but the
            # three PE paths must agree on the contract)
            pe = jnp.broadcast_to(table[None, :s], (b, s, self.dim_size))
            x = jnp.concatenate([x, pe.astype(x.dtype)], axis=-1)
        # 1x1 Conv1d over channels == Dense applied at each position
        x = TorchLinear(self.out_features, dtype=self.dtype, name="conv")(x)
        x = TorchGroupNorm(self.num_groups, dtype=self.dtype, name="norm")(x)
        return x


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch-first layouts).

    query (B, L, E), key/value (B, S, E) -> (output (B, L, E),
    head-averaged weights (B, L, S)). Dropout applies to attention
    probabilities at train time, like torch.
    """

    embed_dim: int = 1024
    num_heads: int = 4
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        e, h = self.embed_dim, self.num_heads
        head_dim = e // h
        kw = dict(dtype=self.dtype)

        # Fused Pallas path: single query position, key==value — the TBN
        # audio-attention case. Inference-only by design: in training the
        # whole attention path (fwd+bwd) measures 0.26 ms of a 44 ms step
        # (round-3 device trace), so the jnp composition's XLA backward is
        # already optimal and a custom VJP kernel cannot pay.
        if (
            self.use_pallas
            and query.shape[1] == 1
            and key is value
            and not train
        ):
            from ..ops.pallas_kernels import mha_pallas

            wq, bq = LinearParams(e, e, name="q_proj")()
            wk, bk = LinearParams(e, e, name="k_proj")()
            wv, bv = LinearParams(e, e, name="v_proj")()
            wo, bo = LinearParams(e, e, name="out_proj")()
            cast = lambda t: t.astype(self.dtype)
            out, wts = mha_pallas(
                query[:, 0, :],
                key,
                cast(wq), cast(bq), cast(wk), cast(bk),
                cast(wv), cast(bv), cast(wo), cast(bo),
                num_heads=h,
            )
            return out[:, None, :], wts[:, None, :]

        q = TorchLinear(e, name="q_proj", **kw)(query)
        k = TorchLinear(e, name="k_proj", **kw)(key)
        v = TorchLinear(e, name="v_proj", **kw)(value)

        b, l, _ = q.shape
        s = k.shape[1]
        q = q.reshape(b, l, h, head_dim).transpose(0, 2, 1, 3) / jnp.sqrt(
            jnp.asarray(head_dim, q.dtype)
        )
        k = k.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        dropped = nn.Dropout(self.dropout_rate, deterministic=not train)(
            probs.astype(self.dtype)
        )
        out = jnp.einsum(
            "bhls,bhsd->bhld", dropped, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, e)
        out = TorchLinear(e, name="out_proj", **kw)(out)
        # torch returns the POST-dropout probabilities, head-averaged
        # (F.multi_head_attention_forward applies dropout before both the
        # value matmul and the need_weights return, torch 1.4 and 2.x
        # alike) — the reference's prior/contrast/entropy losses therefore
        # see the dropped/rescaled weights at train time, and so must ours.
        # Eval: dropout is identity, so this equals the clean softmax.
        weights = jnp.mean(dropped.astype(jnp.float32), axis=1).astype(
            self.dtype
        )
        return out, weights


def gumbel_softmax(
    logits: jnp.ndarray,
    rng: jax.Array,
    temperature: float = 1.0,
    hard: bool = True,
) -> jnp.ndarray:
    """F.gumbel_softmax equivalent with straight-through hard one-hot."""
    gumbels = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    y = jax.nn.softmax((logits.astype(jnp.float32) + gumbels) / temperature, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y.astype(logits.dtype)


class UniModalAttention(nn.Module):
    """MLP(rgb) -> distribution over audio time axis -> weighted sum."""

    win_size: int
    hidden_size: int = 256
    use_gumbel: bool = True
    temperature: float = 1.0
    one_hot: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        rgb_feature: jnp.ndarray,  # (B, C)
        audio_sequence: jnp.ndarray,  # (B, S, C)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        y = TorchLinear(self.hidden_size, name="fc1", **kw)(rgb_feature)
        y = nn.relu(y)
        logits = TorchLinear(self.win_size, name="fc2", **kw)(y)

        if train and self.use_gumbel:
            rng = self.make_rng("gumbel")
            weights = gumbel_softmax(logits, rng, self.temperature, self.one_hot)
        else:
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )

        out = jnp.einsum(
            "bsc,bs->bc", audio_sequence, weights, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return out, weights


class PrototypeAttention(nn.Module):
    """MLP(rgb) picks among 3 Gaussian prototype weight curves."""

    win_size: int
    hidden_size: int = 256
    use_gumbel: bool = True
    temperature: float = 1.0
    dtype: Dtype = jnp.float32

    def prototypes(self) -> np.ndarray:
        """(3, win) — centred Gaussian and its +-(win//2 - 2) rolls
        (reference attention.py:121-132; a non-trainable buffer)."""
        base = gaussian_kernel(self.win_size, sigma=1.0)
        shift = self.win_size // 2 - 2
        return np.concatenate(
            (base, np.roll(base, -shift), np.roll(base, shift)), axis=1
        ).T.astype(np.float32)

    @nn.compact
    def __call__(
        self,
        rgb_feature: jnp.ndarray,  # (B, C)
        audio_sequence: jnp.ndarray,  # (B, S, C)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        protos = jnp.asarray(self.prototypes())
        y = TorchLinear(self.hidden_size, name="fc1", **kw)(rgb_feature)
        y = nn.relu(y)
        logits = TorchLinear(protos.shape[0], name="fc2", **kw)(y)

        if train and self.use_gumbel:
            rng = self.make_rng("gumbel")
            mul = gumbel_softmax(logits, rng, self.temperature, hard=True)
        else:
            mul = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)

        weights = jnp.matmul(mul, protos.astype(self.dtype))
        out = jnp.einsum(
            "bsc,bs->bc", audio_sequence, weights, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return out, weights
