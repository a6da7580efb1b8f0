"""The fused G+D training step — the hot loop of the framework.

Reference hot loop: two separate ``sess.run`` dispatches per iteration,
``d_optim`` then ``g_optim`` (SURVEY.md §4.1). Rebuild: ONE pure function
(jitted once, state donated) that
  1. rolls the generator out over T steps (``lax.scan``),
  2. computes D's loss/grads on real vs stop-gradient(fake) transitions and
     applies D's Adam update,
  3. computes G's adversarial + lambda*recon loss/grads against the *updated*
     D params (sequential semantics — matches the reference's D-before-G
     alternation, documented per SURVEY.md §8 hard-part 2) and applies G's
     Adam update.

Under data parallelism both grad sets and all metrics are ``pmean``-reduced
over the ``data`` mesh axis inside the same trace (BASELINE.json: "single
jitted update with data-parallel psum gradients").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.models import Discriminator, Generator
from action_conditioned_gans_tpu.train import augment
from action_conditioned_gans_tpu.train import losses as L
from action_conditioned_gans_tpu.train.rollout import (
    rollout_generator,
    rollout_teacher_forced,
    scheduled_sampling_prob,
)
from action_conditioned_gans_tpu.train.state import TrainState, make_optimizers

Batch = Dict[str, jax.Array]


def _fold_time(x: jax.Array) -> jax.Array:
    """(B, T, ...) -> (B*T, ...) so D sees every transition as one large
    batch (keeps the MXU fed instead of looping D over timesteps)."""
    return x.reshape((-1,) + x.shape[2:])


def make_train_step(cfg: Config, axis_name: Optional[str] = None):
    """Build the fused step: (TrainState, Batch, rng) -> (TrainState, metrics).

    Batch layout (the unified clip format from the data pipeline):
      frames:  (B, T+1, H, W, C) in [-1, 1]
      actions: (B, T, A)
      states:  (B, T, S)   (only when cfg.model.state_dim > 0)
    """
    m, t = cfg.model, cfg.train
    gen, disc = Generator(m), Discriminator(m)
    g_tx, d_tx = make_optimizers(cfg)
    # Differentiable D-input augmentation policy (() = off); validated here
    # so a typo'd op name fails at build, not mid-training.
    aug_ops = augment.parse_policy(t.d_augment)
    if t.gan_loss not in ("ce", "hinge"):
        raise ValueError(
            f"unknown gan_loss {t.gan_loss!r} (expected 'ce' or 'hinge')"
        )
    if t.gan_loss == "hinge" and t.d_label_smooth > 0:
        raise ValueError(
            "d_label_smooth is a cross-entropy concept; unset it (or use "
            "gan_loss='ce') — silently ignoring it would misreport the run"
        )

    def g_apply(params, frame, action, state):
        return gen.apply({"params": params}, frame, action, state, axis_name=axis_name)

    def d_apply(params, next_frame, frame, action, state):
        return disc.apply(
            {"params": params},
            next_frame,
            frame if m.d_condition_frame else None,
            action if m.d_condition_action else None,
            state,
            axis_name=axis_name,
        )

    def _pmean(x):
        return lax.pmean(x, axis_name) if axis_name is not None else x

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        frames = batch["frames"]
        actions = batch["actions"]
        states = batch.get("states") if m.state_dim else None
        horizon = actions.shape[1]

        rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            # Decorrelate stochastic choices (scheduled sampling) across DP
            # shards; a no-op for the loss math, which never mixes shards.
            rng = jax.random.fold_in(rng, lax.axis_index(axis_name))
        ss_prob = scheduled_sampling_prob(state.step, t)

        def predict(g_params, key):
            """(B, T, H, W, C) generator rollout.

            Teacher forcing (scheduled_sampling off — a STATIC config bit)
            has no step-to-step dependency, so the rollout folds into one
            (B*T) batched forward instead of a T-step scan: identical math,
            T x larger conv batches (VERDICT r1 next-step 4).
            """
            if not t.scheduled_sampling:
                # With norm="batch" the fold would compute G's BN moments
                # over B*T instead of the scan's per-timestep B — a silent
                # dynamics change. time_chunk=1 keeps per-timestep stats
                # (same moments as the scan) while still batching the rest.
                chunk = 1 if m.norm == "batch" else t.rollout_time_chunk
                return rollout_teacher_forced(
                    g_apply,
                    g_params,
                    frames,
                    actions,
                    states,
                    time_chunk=chunk,
                    remat=t.remat_rollout,
                )
            return rollout_generator(
                g_apply,
                g_params,
                frames,
                actions,
                states,
                key,
                ss_prob,
                remat=t.remat_rollout,
            )

        # Flattened (B*T, ...) transitions for the discriminator.
        cond_frames = _fold_time(frames[:, :horizon])
        real_next = _fold_time(frames[:, 1:])
        flat_actions = _fold_time(actions)
        flat_states = _fold_time(states) if states is not None else None

        # Real and fake transitions share one D forward (doubled batch keeps
        # the MXU fed and halves op count). Only valid when normalization is
        # per-sample: with kind="batch" the moments would mix real and fake
        # statistics, changing GAN dynamics, so that mode keeps two applies.
        batch_d = m.norm != "batch"

        # Discriminator microbatching (t.disc_microbatch > 0): scan the D
        # loss/grad over chunks of the folded (B*T) transition axis with
        # gradient accumulation. All losses are per-sample means over
        # equal-size chunks, so mean-of-chunk-means == full-batch mean and
        # accumulated grads equal full-batch grads exactly (up to summation
        # order — pinned by test). GroupNorm is per-sample, so chunking does
        # not change any activation. This caps D's peak activation memory at
        # chunk/(B*T) of the full batch: the single-chip 256^2 config5 OOM
        # (four ~3.75 GB conv temps on the 2*B*T=1920 folded batch) is
        # exactly this tensor (BASELINE.md config5 note).
        # norm="batch" computes D's moments over the full batch; chunking
        # would shrink them to per-chunk statistics (a dynamics change, not
        # the exact math the knob promises), so BN disables microbatching.
        n_flat = real_next.shape[0]
        mb = (
            t.disc_microbatch
            if 0 < t.disc_microbatch < n_flat and m.norm != "batch"
            else 0
        )
        while mb and n_flat % mb:  # largest divisor <= requested size
            mb -= 1
        nc = (n_flat // mb) if mb else 1

        def _chunk_scan(arrays, body_fn, carry0):
            """Scan ``body_fn`` over nc equal chunks of the folded axis.

            ``arrays`` may contain Nones (absent action/state conditioning);
            present entries are reshaped (N, ...) -> (nc, N/nc, ...) and
            ``body_fn(carry, *chunk)`` receives the full tuple with Nones
            re-inserted in place, so both the D and G chunk bodies share one
            unpacking convention.

            ``carry0`` leaves must be fresh replicated zeros: under
            shard_map's varying-manual-axes typing (check_vma=True) the
            accumulators come out of the body data-VARYING (they mix in the
            sharded chunk), so the replicated inits are pcast to varying
            up front or the scan's carry types cannot match (caught by the
            r4 config5 preset sweep — disc_microbatch on the DP path).
            """
            present = [a is not None for a in arrays]
            xs = tuple(
                a.reshape((nc, -1) + a.shape[1:]) for a in arrays if a is not None
            )
            if axis_name is not None:
                carry0 = jax.tree_util.tree_map(
                    lambda x: lax.pcast(x, axis_name, to="varying"), carry0
                )

            def body(carry, chunk):
                it = iter(chunk)
                full = tuple(next(it) if p else None for p in present)
                return body_fn(carry, *full)

            return lax.scan(body, carry0, xs)

        def d_loss_on(d_params, fake_next, real, cond, cond_f, act, st):
            # cond_f: the fake half's conditioning frames when d_augment
            # transformed them separately from the real half's; None reuses
            # `cond` (the no-augmentation case).
            cond_fake = cond if cond_f is None else cond_f
            if batch_d:
                both = jnp.concatenate([real, fake_next], axis=0)
                two = lambda x: (
                    jnp.concatenate([x, x], axis=0) if x is not None else None
                )
                both_cond = (
                    jnp.concatenate([cond, cond_fake], axis=0)
                    if cond is not None
                    else None
                )
                logits = d_apply(d_params, both, both_cond, two(act), two(st))
                real_logits, fake_logits = jnp.split(logits, 2, axis=0)
            else:
                real_logits = d_apply(d_params, real, cond, act, st)
                fake_logits = d_apply(d_params, fake_next, cond_fake, act, st)
            if t.gan_loss == "hinge":
                loss = L.discriminator_hinge_loss(real_logits, fake_logits)
            else:
                loss = L.discriminator_loss(
                    real_logits, fake_logits, t.d_label_smooth
                )
            real_acc, fake_acc = L.discriminator_accuracy(real_logits, fake_logits)
            r1 = jnp.zeros((), jnp.float32)
            if t.r1_weight > 0:
                # R1 gradient penalty (the zero-centered real-sample GP of
                # the Mescheder et al. 2018 genre): (γ/2)·E[‖∇_x D(x)‖²] at
                # the REAL next-frames, conditioning held fixed. The grad
                # of sum-of-logits gives per-sample input grads (and stays
                # correct under norm="batch" coupling). Differentiating the
                # d loss then carries second-order terms through this —
                # jax.grad composes, including inside the microbatch scan.
                def score(x):
                    return d_apply(d_params, x, cond, act, st).sum()

                gx = jax.grad(score)(real)
                r1 = jnp.mean(
                    jnp.sum(
                        jnp.square(gx.astype(jnp.float32)),
                        axis=tuple(range(1, gx.ndim)),
                    )
                )
                loss = loss + 0.5 * t.r1_weight * r1
            return loss, (real_acc, fake_acc, r1)

        def d_value_and_grad(d_params, fake_next, real, cond, cond_f):
            """((loss, (real_acc, fake_acc, r1)), grads), full or chunked."""
            if nc == 1:
                return jax.value_and_grad(d_loss_on, has_aux=True)(
                    d_params, fake_next, real, cond, cond_f, flat_actions, flat_states
                )

            def body(carry, fk, rl, cd, cf, ac, st):
                (l, (ra, fa, r1)), g = jax.value_and_grad(d_loss_on, has_aux=True)(
                    d_params, fk, rl, cd, cf, ac, st
                )
                cl, cra, cfa, cr1, cg = carry
                cg = jax.tree_util.tree_map(lambda a, b: a + b / nc, cg, g)
                return (
                    cl + l / nc,
                    cra + ra / nc,
                    cfa + fa / nc,
                    cr1 + r1 / nc,
                    cg,
                ), None

            # carry0 leaves must be FRESH replicated zeros (_chunk_scan
            # pcasts them to varying unconditionally; an already-varying
            # leaf would fail the cast — ADVICE r4).
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, d_params)
            zero = jnp.zeros((), jnp.float32)
            (loss, ra, fa, r1, grads), _ = _chunk_scan(
                (fake_next, real, cond, cond_f, flat_actions, flat_states),
                body,
                (zero, zero, zero, zero, zero_g),
            )
            return (loss, (ra, fa, r1)), grads

        # --- ONE generator rollout per step. D's fake batch and G's update
        # use the same params and the same sampling key, so the forward is
        # computed once via jax.vjp; D sees it stop-gradiented, G's grads
        # chain the loss-head cotangent back through the saved residuals.
        # (Previously `predict` appeared twice in the trace — for D and again
        # inside G's value_and_grad — relying on XLA CSE to dedupe; vjp makes
        # the single forward structural and keeps the analytic-FLOPs roofline
        # numerator honest.)
        rng, gkey = jax.random.split(rng)
        preds, g_vjp = jax.vjp(lambda p: predict(p, gkey), state.g_params)
        flat_preds = _fold_time(preds)

        # --- D update(s). With disc_steps > 1, D takes multiple Adam steps
        # against the same fake batch (static unroll — reference alternates
        # 1:1, SURVEY.md §4.1).
        fake_for_d = lax.stop_gradient(flat_preds)

        # Differentiable D-input augmentation (train.d_augment; DiffAugment
        # genre — see train/augment.py). Real and fake batches draw
        # independent per-sample params; each conditioning frame gets the
        # SAME transform as its paired next-frame. Params are pre-drawn for
        # the full folded batch so the rows chunk exactly alongside their
        # images under disc microbatching. The G head draws its own params
        # (u_g, applied inside g_head_on so gradients flow through the
        # transform to the generator). Reconstruction stays on RAW preds.
        if aug_ops:
            rng, akey = jax.random.split(rng)
            kr, kf, kg = jax.random.split(akey, 3)
            real_d, cond_real_d = augment.apply(
                aug_ops, augment.draw_params(kr, aug_ops, n_flat), real_next, cond_frames
            )
            fake_d, cond_fake_d = augment.apply(
                aug_ops, augment.draw_params(kf, aug_ops, n_flat), fake_for_d, cond_frames
            )
            u_g = augment.draw_params(kg, aug_ops, n_flat)
        else:
            real_d, cond_real_d = real_next, cond_frames
            fake_d, cond_fake_d, u_g = fake_for_d, None, None

        d_params, d_opt = state.d_params, state.d_opt
        d_loss = jnp.zeros((), jnp.float32)
        real_acc = fake_acc = d_r1 = jnp.zeros((), jnp.float32)
        for _ in range(max(t.disc_steps, 1)):
            (d_loss, (real_acc, fake_acc, d_r1)), d_grads = d_value_and_grad(
                d_params, fake_d, real_d, cond_real_d, cond_fake_d
            )
            d_grads = _pmean(d_grads)
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), d_params, d_updates
            )

        # --- G update against the freshly-updated D (sequential semantics).
        # Loss head differentiated w.r.t. the rollout's OUTPUT, then chained
        # through the saved-forward vjp — same math as value_and_grad over
        # predict∘head, minus the second rollout forward. Chunked over the
        # same microbatch axis as D when disc_microbatch is set (the head's
        # losses are per-sample means, so per-chunk cotangents scaled by
        # 1/nc stack into the exact full-batch cotangent).
        def g_head_on(preds_c, real_c, cond_c, act_c, st_c, u_c):
            # Augment what D sees (grads flow through the transform back to
            # the generator — the DiffAugment contract); reconstruct on the
            # RAW prediction against the raw target.
            d_in, cond_in = augment.apply(aug_ops, u_c, preds_c, cond_c)
            fake_logits = d_apply(d_params, d_in, cond_in, act_c, st_c)
            adv = (
                L.generator_hinge_adv_loss(fake_logits)
                if t.gan_loss == "hinge"
                else L.generator_adv_loss(fake_logits)
            )
            recon = L.reconstruction_loss(preds_c, real_c, t.recon_type)
            return adv + t.recon_weight * recon, (adv, recon)

        if nc == 1:
            (g_loss, (g_adv, g_recon)), d_preds = jax.value_and_grad(
                g_head_on, has_aux=True
            )(flat_preds, real_next, cond_frames, flat_actions, flat_states, u_g)
        else:

            def g_body(carry, pr, rl, cd, ac, st, ug):
                (l, (a, r)), dp = jax.value_and_grad(g_head_on, has_aux=True)(
                    pr, rl, cd, ac, st, ug
                )
                cl, ca, cr = carry
                return (cl + l / nc, ca + a / nc, cr + r / nc), dp * (1.0 / nc)

            # carry0 leaves must be fresh replicated zeros (see the D-side
            # call above / _chunk_scan docstring).
            zero = jnp.zeros((), jnp.float32)
            (g_loss, g_adv, g_recon), dp_chunks = _chunk_scan(
                (flat_preds, real_next, cond_frames, flat_actions, flat_states, u_g),
                g_body,
                (zero, zero, zero),
            )
            d_preds = dp_chunks.reshape(flat_preds.shape)
        (g_grads,) = g_vjp(d_preds.reshape(preds.shape))
        g_grads = _pmean(g_grads)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.g_params, g_updates
        )

        if t.ema_decay > 0:
            d_ema = jnp.asarray(t.ema_decay, jnp.float32)
            g_ema = jax.tree_util.tree_map(
                lambda e, p: (e * d_ema + p.astype(jnp.float32) * (1 - d_ema)).astype(e.dtype),
                state.g_ema,
                g_params,
            )
        else:
            g_ema = state.g_ema
        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            g_ema=g_ema,
        )
        metrics = {
            "d_loss": _pmean(d_loss),
            "g_loss": _pmean(g_loss),
            "g_adv": _pmean(g_adv),
            "g_recon": _pmean(g_recon),
            "d_real_acc": _pmean(real_acc),
            "d_fake_acc": _pmean(fake_acc),
            "ss_prob": ss_prob,
        }
        if t.r1_weight > 0:
            metrics["d_r1"] = _pmean(d_r1)
        if t.log_grad_norms:
            # Post-pmean, PRE-clip global L2 norms — what the optimizer
            # chain receives; the observability for tuning grad_clip_norm
            # (d's is the LAST disc_steps iteration's, matching d_loss).
            import optax

            metrics["g_grad_norm"] = optax.global_norm(g_grads)
            metrics["d_grad_norm"] = optax.global_norm(d_grads)
        return new_state, metrics

    return train_step


def make_multi_train_step(cfg: Config, axis_name: Optional[str] = None):
    """k = cfg.train.steps_per_call sequential fused steps per dispatch.

    ``lax.scan`` over the fused step: semantically identical to k separate
    calls (the per-step rng still folds in state.step), but one device
    dispatch — which matters on runtimes with per-call overhead (measured
    2.9x throughput at k=4 via the tunneled chip). Batch leaves gain a
    leading (k, ...) axis; returned metrics are the LAST step's.
    """
    step = make_train_step(cfg, axis_name)
    k = cfg.train.steps_per_call
    if k <= 1:
        return step

    def multi(state: TrainState, batches: Batch, rng: jax.Array):
        def body(s, b):
            s2, m = step(s, b, rng)
            return s2, m

        state, ms = lax.scan(
            body, state, batches, unroll=max(cfg.train.scan_unroll, 1)
        )
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        return state, last

    return multi


def stack_batches(batch: Batch, k: int) -> Batch:
    """(k*B, ...) clip batch -> (k, B, ...) for the multi-step scan."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]), batch
    )


def jit_train_step(cfg: Config):
    """Single-device jitted step with donated state (the config-1 CPU/1-chip
    path; multi-device wrappers live in ``parallel/``)."""
    step = make_train_step(cfg, axis_name=None)
    return jax.jit(step, donate_argnums=(0,))
