"""Barlow Twins, Triplet, and SSIM losses (``Utility/diverse_losses.py``)."""

import jax
import jax.numpy as jnp


def barlow_twins_loss(z_a, z_b, lambda_offdiag: float = 5e-3):
    """Cross-correlation identity objective (reference :10-30 semantics):
    z_a/z_b (B, D) two views; returns on-diag + lambda * off-diag terms."""
    b = z_a.shape[0]
    z_a = (z_a - z_a.mean(0)) / (z_a.std(0) + 1e-6)
    z_b = (z_b - z_b.mean(0)) / (z_b.std(0) + 1e-6)
    c = (z_a.T @ z_b) / b
    on_diag = jnp.sum((jnp.diag(c) - 1.0) ** 2)
    off_diag = jnp.sum(c ** 2) - jnp.sum(jnp.diag(c) ** 2)
    return on_diag + lambda_offdiag * off_diag


def triplet_loss(anchor, positive, negative, margin: float = 1.0):
    """Euclidean triplet margin loss (B, D) -> scalar."""
    d_pos = jnp.sqrt(jnp.sum((anchor - positive) ** 2, axis=-1) + 1e-12)
    d_neg = jnp.sqrt(jnp.sum((anchor - negative) ** 2, axis=-1) + 1e-12)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1, img2, window_size: int = 11, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2):
    """Structural similarity over (B, H, W) images, gaussian-windowed."""
    window = _gaussian_window(window_size)[:, :, None, None]  # (k, k, 1, 1)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[..., None], window, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1 = filt(img1 ** 2) - mu1_sq
    sigma2 = filt(img2 ** 2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / \
               ((mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2))
    return jnp.mean(ssim_map)
