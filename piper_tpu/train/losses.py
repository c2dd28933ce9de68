"""GAN / VAE losses.

Parity: reference losses.py — LSGAN discriminator/generator losses,
feature-matching (x2), masked KL. All reductions in float32.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """Mean-abs feature matching over all discriminator fmaps, x2
    (losses.py:4-12). Real features are stop-gradient by construction
    (the discriminator call on real audio is outside the generator's
    grad path)."""
    loss = jnp.float32(0.0)
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(
    disc_real: Sequence[jnp.ndarray], disc_gen: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LSGAN: (1-D(y))^2 + D(y_hat)^2 (losses.py:15-28)."""
    loss = jnp.float32(0.0)
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        g = jnp.mean(jnp.square(dg.astype(jnp.float32)))
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(
    disc_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LSGAN generator: (1-D(y_hat))^2 (losses.py:31-40)."""
    loss = jnp.float32(0.0)
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jnp.ndarray:
    """Masked KL(q||p) between posterior and expanded prior
    (losses.py:43-58). Inputs (B, T, C); z_mask (B, T, 1)."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
