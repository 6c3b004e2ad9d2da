# -*- coding: utf-8 -*-
"""Relativistic average GAN losses.

Parity: reference ``climsr/task/pl_gan.py:28-61`` — relativistic scores
``d_rf = D(hr) - mean(D(sr))``, ``d_fr = D(sr) - mean(D(hr))`` with the
reference's *swapped* label assignment in the generator loss
(``adversarial_loss_rf`` uses fake labels, ``adversarial_loss_fr`` real —
``pl_gan.py:36-37``) and the standard assignment in the discriminator loss.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch BCEWithLogitsLoss (mean reduction)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(labels * log_p + (1.0 - labels) * log_not_p)


def relativistic_g_loss(score_real: jax.Array, score_fake: jax.Array) -> jax.Array:
    real_labels = jnp.ones_like(score_real)
    fake_labels = jnp.zeros_like(score_fake)
    d_rf = score_real - jnp.mean(score_fake)
    d_fr = score_fake - jnp.mean(score_real)
    adv_rf = bce_with_logits(d_rf, fake_labels)
    adv_fr = bce_with_logits(d_fr, real_labels)
    return (adv_fr + adv_rf) / 2.0


def relativistic_d_loss(score_real: jax.Array, score_fake: jax.Array) -> jax.Array:
    real_labels = jnp.ones_like(score_real)
    fake_labels = jnp.zeros_like(score_fake)
    d_rf = score_real - jnp.mean(score_fake)
    d_fr = score_fake - jnp.mean(score_real)
    adv_rf = bce_with_logits(d_rf, real_labels)
    adv_fr = bce_with_logits(d_fr, fake_labels)
    return (adv_fr + adv_rf) / 2.0
