"""GAN + reconstruction losses (SURVEY.md §3 row 6).

Reference behavior: sigmoid cross-entropy adversarial losses
(``d_loss = CE(D(real), 1) + CE(D(fake), 0)``,
``g_loss = CE(D(fake), 1) + lambda * ||G(x, a) - y||``) with a selectable
L2/L1 reconstruction term. Implemented in the numerically-stable softplus
form; everything reduces in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discriminator_loss(
    real_logits: jax.Array,
    fake_logits: jax.Array,
    real_label_smooth: float = 0.0,
) -> jax.Array:
    """CE(D(real), 1-ε) + CE(D(fake), 0), softplus form.

    ``real_label_smooth`` is the ONE-SIDED label smoothing of Salimans et
    al. 2016: only the real targets soften (1 → 1-ε), expanding
    CE(x, 1-ε) = (1-ε)·softplus(-x) + ε·softplus(x); smoothing fake labels
    too is known to be harmful (it pulls D's optimum toward the generator
    density). ε=0 reduces exactly to the reference loss.
    """
    rl = real_logits.astype(jnp.float32)
    fake = jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))
    if real_label_smooth == 0.0:
        return jnp.mean(jax.nn.softplus(-rl)) + fake
    eps = real_label_smooth
    real = jnp.mean(
        (1.0 - eps) * jax.nn.softplus(-rl) + eps * jax.nn.softplus(rl)
    )
    return real + fake


def generator_adv_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating CE(D(fake), 1) == softplus(-fake)."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def discriminator_hinge_loss(
    real_logits: jax.Array, fake_logits: jax.Array
) -> jax.Array:
    """Hinge GAN loss for D (Lim & Ye 2017; the SN-GAN pairing):
    E[relu(1 - D(real))] + E[relu(1 + D(fake))]."""
    real = jnp.mean(jax.nn.relu(1.0 - real_logits.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.relu(1.0 + fake_logits.astype(jnp.float32)))
    return real + fake


def generator_hinge_adv_loss(fake_logits: jax.Array) -> jax.Array:
    """Hinge G loss: -E[D(fake)] (linear — no saturation to escape)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def reconstruction_loss(pred: jax.Array, target: jax.Array, kind: str = "l2") -> jax.Array:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if kind == "l2":
        return jnp.mean(jnp.square(diff))
    if kind == "l1":
        return jnp.mean(jnp.abs(diff))
    raise ValueError(f"unknown reconstruction loss {kind!r}")


def discriminator_accuracy(real_logits: jax.Array, fake_logits: jax.Array):
    """Fraction of real (fake) examples D classifies correctly — a training
    health metric, not a loss."""
    real_acc = jnp.mean((real_logits > 0).astype(jnp.float32))
    fake_acc = jnp.mean((fake_logits < 0).astype(jnp.float32))
    return real_acc, fake_acc
