#!/usr/bin/env python
"""Probe: pair the RGB + Flow towers channel-wise into grouped convs.

From conv2 onward the two visual towers have identical activation shapes
([36,56,56,64] etc.) with different weights. A feature_group_count=2 conv
over channel-concatenated activations computes both towers in ONE kernel
with zero wasted MACs - and doubles the output-channel lane fill (64 -> 128)
on the narrow inception branches. This measures fwd and wgrad of
representative convs in separate vs grouped form.

Measurement: a single jitted lax.fori_loop running the op N times with a
loop-carried dependency - per-call dispatch over the axon tunnel is ~9 ms,
so op-level timing MUST amortize inside one executable (PERF.md).

Usage: python benchmarks/tower_pair_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 200


def loop_time(make_body, init, iters=ITERS):
    """Time one jitted fori_loop of `iters` body applications, minus a
    2-iteration run to subtract dispatch+sync overhead."""
    import jax

    def run(n):
        f = jax.jit(
            lambda c: jax.lax.fori_loop(0, n, make_body, c), static_argnums=()
        )
        c = f(init)
        jax.block_until_ready(c)
        start = time.perf_counter()
        c = f(init)
        jax.block_until_ready(c)
        return time.perf_counter() - start

    t_full = run(iters)
    t_base = run(2)
    return (t_full - t_base) / (iters - 2) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        )
    )

    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def bench_case(name, B, H, W, CIN, COUT, K):
        x1 = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
        x2 = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((K, K, CIN, COUT)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((K, K, CIN, COUT)) * 0.05, jnp.bfloat16)
        pad = ((K // 2, K // 2),) * 2
        xc = jnp.concatenate([x1, x2], axis=-1)
        wc = jnp.concatenate([w1, w2], axis=-1)

        def conv(x, w, fg=1):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), pad, dimension_numbers=dn, feature_group_count=fg
            )

        # correctness of the grouped pairing
        a = np.asarray(conv(x1, w1), np.float32)
        b = np.asarray(conv(x2, w2), np.float32)
        g = np.asarray(conv(xc, wc, 2), np.float32)
        err = max(
            np.abs(a - g[..., :COUT]).max(), np.abs(b - g[..., COUT:]).max()
        )

        eps = jnp.bfloat16(1e-8)

        def body_two(i, c):
            x1, x2 = c
            y1, y2 = conv(x1, w1), conv(x2, w2)
            d1 = (jnp.mean(y1) * eps).astype(x1.dtype)
            d2 = (jnp.mean(y2) * eps).astype(x2.dtype)
            return x1 + d1, x2 + d2

        def body_grp(i, xc):
            y = conv(xc, wc, 2)
            return xc + (jnp.mean(y) * eps).astype(xc.dtype)

        def wg(x, w, fg=1):
            _, vjp = jax.vjp(lambda w: conv(x, w, fg), w)
            return vjp(jnp.ones((B, H, W, w.shape[-1]), x.dtype))[0]

        def body_two_w(i, c):
            u1, u2 = c
            g1, g2 = wg(x1, u1), wg(x2, u2)
            return u1 + g1 * eps, u2 + g2 * eps

        def body_grp_w(i, uc):
            return uc + wg(xc, uc, 2) * eps

        t2f = loop_time(body_two, (x1, x2))
        tgf = loop_time(body_grp, xc)
        t2w = loop_time(body_two_w, (w1, w2))
        tgw = loop_time(body_grp_w, wc)
        print(
            f"{name:26s} err {err:8.1e}  fwd two {t2f*1e3:7.1f} grp {tgf*1e3:7.1f} us"
            f"   wgrad two {t2w*1e3:7.1f} grp {tgw*1e3:7.1f} us"
        )

    bench_case("conv2_3x3 56px 64->192", 36, 56, 56, 64, 192, 3)
    bench_case("inc3 3x3 28px 64->96", 36, 28, 28, 64, 96, 3)
    bench_case("merged1x1 28px 256->320", 36, 28, 28, 256, 320, 1)
    bench_case("inc4 3x3 14px 96->128", 36, 14, 14, 96, 128, 3)
    bench_case("merged1x1 14px 608->736", 36, 14, 14, 608, 736, 1)
    bench_case("inc5 3x3 7px 160->320", 36, 7, 7, 160, 320, 3)


if __name__ == "__main__":
    main()
