#!/usr/bin/env python
"""Op-level A/B of the weight-gradient engines (ModelConfig.wgrad) at the
discriminator's actual conv shapes.

For each D layer shape (64-px headline geometry, batch 128 folded
transitions), times grad(loss) of a single conv under wgrad="xla" (AD's
conv-shaped wgrad) vs "patches" (im2col matmul, ops/wgrad.py), using the
platform-mandated methodology (CLAUDE.md 1/1b): ITERS scanned inside one
jit over a BANK of rotated inputs, identity-scan baseline subtracted,
window ended by a scalar device_get.

Usage: python scripts/wgrad_bench.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from action_conditioned_gans_tpu.ops import xla as oxla
from action_conditioned_gans_tpu.ops.wgrad import conv2d_patches_wgrad

ITERS = 128
REPS = 5
BANK = 4


def grad_scan(conv, stride):
    @jax.jit
    def fn(xs, w, dys):
        def body(acc, i):
            x = jax.lax.dynamic_index_in_dim(xs, i % BANK, keepdims=False)
            dy = jax.lax.dynamic_index_in_dim(dys, i % BANK, keepdims=False)

            def loss(w):
                return jnp.vdot(conv(x, w, stride).astype(jnp.float32), dy)

            dw = jax.grad(loss)(w)
            return acc + dw.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(ITERS))
        return acc

    return fn


def null_scan():
    @jax.jit
    def fn(xs, w, dys):
        def body(acc, i):
            x = jax.lax.dynamic_index_in_dim(xs, i % BANK, keepdims=False)
            dy = jax.lax.dynamic_index_in_dim(dys, i % BANK, keepdims=False)
            return acc + x.astype(jnp.float32).mean() + dy.astype(
                jnp.float32
            ).mean() + w.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(ITERS))
        return acc

    return fn


def time_total(fn, *args):
    for _ in range(2):
        float(jax.device_get(fn(*args)))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    key = jax.random.PRNGKey(0)
    # D stack at 64 px, d_base_channels 64 cap 512, conditioned input 9ch
    # (frame pair + tiled action); config3's 3x3 stride-1 extras; and the
    # G decoder's transpose convs (name, in_hw, cin, cout, k, stride, T?).
    shapes = [
        ("conv_0", 64, 9, 64, 4, 2, False),
        ("conv_1", 32, 64, 128, 4, 2, False),
        ("conv_2", 16, 128, 256, 4, 2, False),
        ("conv_3", 8, 256, 512, 4, 2, False),
        ("extra_3x3", 8, 256, 256, 3, 1, False),
        ("dec_2^T", 8, 256, 128, 4, 2, True),
        ("dec_1^T", 16, 128, 64, 4, 2, True),
        ("dec_0^T", 32, 64, 3, 4, 2, True),
    ]
    from action_conditioned_gans_tpu.ops.wgrad import conv2d_transpose_patches_wgrad

    convs = {
        (False, "xla"): lambda x, w, s: oxla.conv2d(x, w, stride=s),
        (False, "patches"): lambda x, w, s: conv2d_patches_wgrad(x, w, s),
        (True, "xla"): lambda x, w, s: oxla.conv2d_transpose(x, w, stride=s),
        (True, "patches"): lambda x, w, s: conv2d_transpose_patches_wgrad(x, w, s),
    }
    print(f"batch={batch} iters={ITERS} bank={BANK} (per-iter ms, null-subtracted)")
    for name, hw, cin, cout, k, s, tr in shapes:
        xs = jax.random.normal(key, (BANK, batch, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.02
        out_hw = hw * s if tr else hw // s
        dys = jax.random.normal(key, (BANK, batch, out_hw, out_hw, cout), jnp.float32)
        null_s = time_total(null_scan(), xs, w, dys)
        row = [f"{name:10s}"]
        for eng in ("xla", "patches"):
            tot = time_total(grad_scan(convs[(tr, eng)], s), xs, w, dys)
            row.append(f"{eng}={max(tot - null_s, 0.0) / ITERS * 1e3:7.3f} ms")
        print("  ".join(row))


if __name__ == "__main__":
    main()
