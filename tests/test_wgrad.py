"""Equivalence tests for the patches-dot weight gradient (ops/wgrad.py,
ModelConfig.wgrad="patches").

Pins: (1) the patch feature ordering assumption, (2) forward bit-equality
with the XLA conv, (3) dx bit-equality with AD (same transposed-conv HLO),
(4) dw equality with AD — exact in float32, bf16-rounding tolerance in
bfloat16 (the patches dot accumulates straight to f32 where AD's wgrad conv
rounds through bf16), and (5) a full train step under wgrad="patches"
matching the default within bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from action_conditioned_gans_tpu.ops import xla as X
from action_conditioned_gans_tpu.ops.wgrad import conv2d_patches_wgrad


def _inputs(dtype, b=2, hw=8, cin=3, cout=5, k=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, hw, hw, cin), dtype)
    w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    return x, w


def test_patch_order():
    """conv_general_dilated_patches feature ordering is (C, kh, kw) with the
    channel slowest — the reshape in ops/wgrad.py depends on it."""
    x, _ = _inputs(jnp.float32)
    kh = kw = 4
    p = lax.conv_general_dilated_patches(
        x, (kh, kw), (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # SAME, stride 2, k=4 on 8x8: pad (1, 1) per spatial dim.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    manual = xp[:, 2 : 2 + kh, 2 : 2 + kw, :]  # output position (1, 1)
    want = manual.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # (C, kh, kw)
    np.testing.assert_array_equal(np.asarray(p[:, 1, 1, :]), np.asarray(want))


@pytest.mark.parametrize("stride,k", [(2, 4), (1, 3)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_ad(stride, k, dtype):
    x, w = _inputs(dtype, k=k)

    def loss_ref(x, w):
        return jnp.sum(jnp.square(X.conv2d(x, w, stride=stride)))

    def loss_new(x, w):
        return jnp.sum(jnp.square(conv2d_patches_wgrad(x, w, stride)))

    y_ref = X.conv2d(x, w, stride=stride)
    y_new = conv2d_patches_wgrad(x, w, stride)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))

    (dx_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    (dx_n, dw_n) = jax.grad(loss_new, argnums=(0, 1))(x, w)
    # dx is the identical transposed-conv HLO.
    np.testing.assert_array_equal(np.asarray(dx_r), np.asarray(dx_n))
    assert dw_n.dtype == w.dtype
    if dtype == jnp.float32:
        np.testing.assert_allclose(
            np.asarray(dw_r), np.asarray(dw_n), rtol=2e-5, atol=2e-5
        )
    else:
        # AD rounds the wgrad-conv result through bf16; the patches dot
        # accumulates to f32 — agree to bf16 resolution of the magnitudes.
        scale = np.abs(np.asarray(dw_r)).max()
        np.testing.assert_allclose(
            np.asarray(dw_r), np.asarray(dw_n), atol=0.02 * scale, rtol=0.02
        )


@pytest.mark.parametrize("stride,k,padding", [(2, 4, "SAME"), (2, 4, "VALID"), (1, 3, "SAME"), (3, 2, "SAME")])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_transpose_grads_match_ad(stride, k, padding, dtype):
    from action_conditioned_gans_tpu.ops.wgrad import conv2d_transpose_patches_wgrad

    x, w = _inputs(dtype, k=k)

    def loss_ref(x, w):
        return jnp.sum(jnp.square(X.conv2d_transpose(x, w, stride=stride, padding=padding)))

    def loss_new(x, w):
        return jnp.sum(jnp.square(conv2d_transpose_patches_wgrad(x, w, stride, padding)))

    y_ref = X.conv2d_transpose(x, w, stride=stride, padding=padding)
    y_new = conv2d_transpose_patches_wgrad(x, w, stride, padding)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))

    (dx_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    (dx_n, dw_n) = jax.grad(loss_new, argnums=(0, 1))(x, w)
    if dtype == jnp.float32:
        np.testing.assert_allclose(
            np.asarray(dx_r), np.asarray(dx_n), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(dw_r), np.asarray(dw_n), rtol=2e-5, atol=2e-5
        )
    else:
        for r, n in ((dx_r, dx_n), (dw_r, dw_n)):
            scale = np.abs(np.asarray(r, np.float32)).max()
            np.testing.assert_allclose(
                np.asarray(r, np.float32),
                np.asarray(n, np.float32),
                atol=0.02 * scale,
                rtol=0.02,
            )


def test_analytic_flops_invariant_across_wgrad_engines():
    """The roofline numerator must not change with the wgrad engine: the
    patches-extraction identity-kernel conv is priced as zero-FLOP data
    movement (utils/profiling.py), and the dw dot has exactly the wgrad
    conv's arithmetic. Grads taken wrt BOTH inputs — a custom_vjp always
    emits dx even when dead (XLA DCEs it; a w-only jaxpr count would
    differ for that reason alone)."""
    from action_conditioned_gans_tpu.ops.wgrad import conv2d_transpose_patches_wgrad
    from action_conditioned_gans_tpu.utils.profiling import analytic_matmul_flops

    x = jnp.zeros((4, 16, 16, 32), jnp.float32)

    def both_grads(f):
        def g(x, w):
            dx, dw = jax.grad(lambda x, w: f(x, w).sum(), argnums=(0, 1))(x, w)
            return jnp.sum(dx) + jnp.sum(dw)

        return g

    w = jnp.zeros((4, 4, 32, 64), jnp.float32)
    ref = analytic_matmul_flops(
        both_grads(lambda x, w: X.conv2d(x, w, stride=2)), x, w
    )
    new = analytic_matmul_flops(
        both_grads(lambda x, w: conv2d_patches_wgrad(x, w, 2)), x, w
    )
    assert ref == new, (ref, new)

    wt = jnp.zeros((4, 4, 32, 16), jnp.float32)
    ref = analytic_matmul_flops(
        both_grads(lambda x, w: X.conv2d_transpose(x, w, stride=2)), x, wt
    )
    new = analytic_matmul_flops(
        both_grads(lambda x, w: conv2d_transpose_patches_wgrad(x, w, 2)), x, wt
    )
    assert ref == new, (ref, new)


def test_analytic_flops_invariant_single_channel():
    """The fgc == 1 corner (single-channel x / dy, e.g. image_channels=1):
    the one-hot structural heuristic cannot fire there, so invariance rests
    on the NAMED jit wrapper around the patch extraction (ops/wgrad.py
    _acgan_patches_extract, priced bytes-only by utils/profiling.py)."""
    from action_conditioned_gans_tpu.ops.wgrad import conv2d_transpose_patches_wgrad
    from action_conditioned_gans_tpu.utils.profiling import analytic_matmul_flops

    def both_grads(f):
        def g(x, w):
            dx, dw = jax.grad(lambda x, w: f(x, w).sum(), argnums=(0, 1))(x, w)
            return jnp.sum(dx) + jnp.sum(dw)

        return g

    x = jnp.zeros((2, 16, 16, 1), jnp.float32)  # cin=1 -> patches fgc=1
    w = jnp.zeros((4, 4, 1, 8), jnp.float32)
    ref = analytic_matmul_flops(
        both_grads(lambda x, w: X.conv2d(x, w, stride=2)), x, w
    )
    new = analytic_matmul_flops(
        both_grads(lambda x, w: conv2d_patches_wgrad(x, w, 2)), x, w
    )
    assert ref == new, (ref, new)

    xt = jnp.zeros((2, 8, 8, 4), jnp.float32)
    wt = jnp.zeros((4, 4, 4, 1), jnp.float32)  # cout=1 -> dy-patches fgc=1
    ref = analytic_matmul_flops(
        both_grads(lambda x, w: X.conv2d_transpose(x, w, stride=2)), xt, wt
    )
    new = analytic_matmul_flops(
        both_grads(lambda x, w: conv2d_transpose_patches_wgrad(x, w, 2)), xt, wt
    )
    assert ref == new, (ref, new)


def test_unknown_wgrad_rejected():
    from action_conditioned_gans_tpu import ops

    x, w = _inputs(jnp.float32)
    with pytest.raises(ValueError, match="wgrad"):
        ops.conv2d(x, w, stride=2, wgrad="bogus")
    # The validation must run on EVERY backend path, not just xla.
    with pytest.raises(ValueError, match="wgrad"):
        ops.conv2d(x, w, stride=2, backend="pallas", wgrad="bogus")
    with pytest.raises(ValueError, match="wgrad"):
        ops.conv2d_transpose(x, w, stride=2, backend="pallas", wgrad="bogus")


def test_pallas_plus_patches_rejected():
    """backend='pallas' + wgrad='patches' is contradictory (the pallas conv
    has its own custom VJP) — rejected at both the op and the config layer
    so an A/B run can never silently measure the wrong engine."""
    from action_conditioned_gans_tpu import ops
    from action_conditioned_gans_tpu.config import ModelConfig

    x, w = _inputs(jnp.float32)
    with pytest.raises(ValueError, match="incompatible"):
        ops.conv2d(x, w, stride=2, backend="pallas", wgrad="patches")
    with pytest.raises(ValueError, match="incompatible"):
        ops.conv2d_transpose(x, w, stride=2, backend="pallas", wgrad="patches")
    with pytest.raises(ValueError, match="incompatible"):
        ModelConfig(backend="pallas", wgrad="patches")
    with pytest.raises(ValueError, match="wgrad"):
        ModelConfig(wgrad="bogus")


def test_train_step_with_patches_wgrad():
    """One fused G+D step with wgrad='patches' stays numerically on top of
    the default path (same rng, same batch)."""

    from action_conditioned_gans_tpu.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.train.state import init_state
    from action_conditioned_gans_tpu.train.step import make_train_step

    def cfg_for(wgrad):
        return Config(
            name="wgrad-test",
            model=ModelConfig(
                image_size=16,
                g_levels=2,
                g_base_channels=8,
                d_levels=2,
                d_base_channels=8,
                group_norm_groups=4,
                compute_dtype="float32",
                wgrad=wgrad,
            ),
            data=DataConfig(seq_len=2),
            train=TrainConfig(batch_size=4, rollout_length=1),
        )

    batch = generate_clips(jax.random.PRNGKey(1), 4, 2, 16, 4)
    rng = jax.random.PRNGKey(2)
    metrics = {}
    for wg in ("xla", "patches"):
        cfg = cfg_for(wg)
        state = init_state(cfg, jax.random.PRNGKey(0))
        _, m = jax.jit(make_train_step(cfg))(state, batch, rng)
        metrics[wg] = {k: float(v) for k, v in m.items()}
    for key in ("g_loss", "d_loss", "g_recon"):
        np.testing.assert_allclose(
            metrics["xla"][key], metrics["patches"][key], rtol=1e-5,
            err_msg=key,
        )


def test_dp_step_with_patches_wgrad():
    """wgrad='patches' composes with shard_map DP (+ scheduled-sampling scan
    + remat) — requires the check_vma opt-out in make_dp_train_step (jax's
    scan-transpose vma bookkeeping rejects custom_vjp cotangents) — and
    matches the default wgrad on the same sharded batch."""

    from action_conditioned_gans_tpu.config import (
        Config,
        DataConfig,
        MeshConfig,
        ModelConfig,
        TrainConfig,
    )
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )
    from action_conditioned_gans_tpu.train.state import init_state

    def run(wg):
        cfg = Config(
            name="t",
            model=ModelConfig(
                image_size=16,
                g_levels=2,
                g_base_channels=8,
                d_levels=2,
                d_base_channels=8,
                group_norm_groups=4,
                compute_dtype="float32",
                wgrad=wg,
            ),
            data=DataConfig(seq_len=3),
            train=TrainConfig(
                batch_size=8,
                rollout_length=2,
                scheduled_sampling=True,
                remat_rollout=True,
            ),
            mesh=MeshConfig(data=8, model=1),
        )
        mesh = make_mesh(cfg.mesh)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = generate_clips(jax.random.PRNGKey(1), 8, 3, 16, 4)
        step = make_dp_train_step(cfg, mesh)
        _, m = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(2))
        return {k: float(v) for k, v in m.items()}

    a, b = run("patches"), run("xla")
    for key in ("g_loss", "d_loss", "g_recon"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-5, err_msg=key)
