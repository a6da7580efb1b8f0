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


def discriminator_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """CE(D(real), 1) + CE(D(fake), 0) == softplus(-real) + softplus(fake)."""
    real = jnp.mean(jax.nn.softplus(-real_logits.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))
    return real + fake


def generator_adv_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating CE(D(fake), 1) == softplus(-fake)."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


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
