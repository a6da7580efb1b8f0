#!/usr/bin/env python
"""Per-layer true-barrier breakdown: where does the pallas conv lose to XLA?

Platform-aware methodology (see CLAUDE.md / BASELINE.md):
  * the tunneled chip charges a fixed ~26 ms dispatch->device_get round trip,
    so each measurement scans the op ITERS times inside ONE jit and the
    identity-op baseline (same scan, op removed) is subtracted;
  * inputs are perturbed per-iteration to defeat CSE;
  * windows end in a scalar device_get (the only true barrier here).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from action_conditioned_gans_tpu.ops import xla as oxla
from action_conditioned_gans_tpu.ops.pallas import conv as pconv

ITERS = 256
REPS = 5


BANK = 4  # rotate through BANK distinct inputs: no algebraic rewrite (scalar
# hoisting through the linear conv / scale-invariant GroupNorm) can lift the
# op out of the loop, unlike an x*(1+i*eps) perturbation.


def scan_op(op):
    """jit(xs, w) -> scalar: sum of op over ITERS bank-rotated inputs."""

    @jax.jit
    def fn(xs, w):
        def body(acc, i):
            x = jax.lax.dynamic_index_in_dim(xs, i % BANK, keepdims=False)
            y = op(x, w)
            return acc + y.astype(jnp.float32).mean(), None

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


def per_iter_ms(op, null_total_s, xs, w):
    total = time_total(scan_op(op), xs, w)
    return (total - null_total_s) / ITERS * 1e3


# (tag, B, H, W, Cin, Cout, k, stride, transpose)
LAYERS = [
    ("G enc0", 128, 64, 64, 3, 64, 4, 2, False),
    ("G enc1", 128, 32, 32, 64, 128, 4, 2, False),
    ("G enc2", 128, 16, 16, 128, 256, 4, 2, False),
    ("G bott", 128, 8, 8, 260, 256, 3, 1, False),
    ("G dec2", 128, 8, 8, 512, 128, 4, 2, True),
    ("G dec1", 128, 16, 16, 256, 64, 4, 2, True),
    ("G dec0", 128, 32, 32, 128, 3, 4, 2, True),
    ("D conv0", 256, 64, 64, 10, 64, 4, 2, False),
    ("D conv1", 256, 32, 32, 64, 128, 4, 2, False),
    ("D conv2", 256, 16, 16, 128, 256, 4, 2, False),
]


def main():
    key = jax.random.PRNGKey(0)
    for tag, b, h, w, cin, cout, k, s, tr in LAYERS:
        xs = jax.random.normal(key, (BANK, b, h, w, cin), jnp.bfloat16)
        x = xs[0]
        wgt = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.05
        scale = jnp.ones((cout,), jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)

        # identity-op baseline: same scan skeleton, op = mean passthrough.
        null_total = time_total(scan_op(lambda x, w: x), xs, wgt)

        if tr:
            xla_op = lambda x, w: oxla.norm_act(
                oxla.conv2d_transpose(x, w, stride=s), scale, bias, groups=32
            )
            conv_only = lambda x, w: oxla.conv2d_transpose(x, w, stride=s)
            sup = pconv.conv_transpose_norm_act_supported(x, wgt, s, "group", 32)
            pl_op = lambda x, w: pconv.conv_transpose_norm_act(
                x, w, scale, bias, stride=s, groups=32
            )
            prep = None
            nb = 1
        else:
            xla_op = lambda x, w: oxla.norm_act(
                oxla.conv2d(x, w, stride=s), scale, bias, groups=32
            )
            conv_only = lambda x, w: oxla.conv2d(x, w, stride=s)
            sup = pconv.conv_norm_act_supported(x, wgt, s, "group", 32)
            pl_op = lambda x, w: pconv.conv_norm_act(
                x, w, scale, bias, stride=s, groups=32
            )
            plan = pconv._plan(x.shape, wgt.shape, s, 2)
            prep = (lambda x, w: pconv._prepare_inputs(x, w, plan)[0]) if plan else None
            nb = plan["nb"] if plan else 0

        t_xla = per_iter_ms(xla_op, null_total, xs, wgt)
        t_conv = per_iter_ms(conv_only, null_total, xs, wgt)
        if not sup:
            print(
                f"{tag:8s} xla {t_xla*1e3:7.1f} us (conv {t_conv*1e3:6.1f}) | pallas UNSUPPORTED"
            )
            continue
        t_pl = per_iter_ms(pl_op, null_total, xs, wgt)
        t_prep = per_iter_ms(prep, null_total, xs, wgt) if prep is not None else float("nan")
        print(
            f"{tag:8s} xla {t_xla*1e3:7.1f} us (conv {t_conv*1e3:6.1f}) | "
            f"pallas {t_pl*1e3:7.1f} us | prep {t_prep*1e3:6.1f} us | nb {nb}"
        )


if __name__ == "__main__":
    main()
