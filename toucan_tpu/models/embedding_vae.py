"""Speaker-embedding VAE (``Spectrogram_to_Embedding/EmbeddingVAE``).

Small MLP VAE over 64-dim speaker embeddings for sampling artificial
voices (superseded by the WGAN in the reference, kept for capability
parity).  Same layer widths and loss mix: KL + 0.1*L1 + (1 - cosine) +
0.1*MSE; the encoder's variance head predicts in log space.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class EmbeddingVAE(nn.Module):
    bottleneck_size: int = 16
    dtype: jnp.dtype = jnp.float32

    def _encode(self, x):
        for i, w in enumerate((64, 32, 32, 32, 32, 16, self.bottleneck_size)):
            x = jnp.tanh(nn.Dense(w, dtype=self.dtype, name=f"enc_{i}")(x))
        mean = x
        for i, (w, act) in enumerate([(self.bottleneck_size, jnp.tanh),
                                      (self.bottleneck_size, nn.relu)]):
            mean = act(nn.Dense(w, dtype=self.dtype, name=f"mean_{i}")(mean))
        log_var = x
        for i, (w, act) in enumerate([(self.bottleneck_size, jnp.tanh),
                                      (self.bottleneck_size, nn.relu)]):
            log_var = act(nn.Dense(w, dtype=self.dtype, name=f"var_{i}")(log_var))
        return mean, log_var

    def _decode(self, z):
        widths = (16, 32, 32, 64) + (64,) * 10
        for i, w in enumerate(widths):
            z = nn.Dense(w, dtype=self.dtype, name=f"dec_{i}")(z)
            if i < len(widths) - 1:
                z = jnp.tanh(z)
        return z

    @nn.compact
    def __call__(self, target_data=None, rng=None, z=None,
                 noise_scale_during_inference: float = 1.4):
        if target_data is not None:
            means, log_var = self._encode(target_data)
            sigma = jnp.exp(log_var)
            eps = jax.random.normal(rng, means.shape, self.dtype)
            z = means + sigma * eps
            recon = self._decode(z)
            # KL(N(mu, sigma) || N(0, 1))
            kl = jnp.mean(-jnp.log(jnp.maximum(sigma, 1e-8))
                          + (sigma ** 2 + means ** 2) / 2 - 0.5)
            cos = jnp.sum(recon * target_data, -1) / jnp.maximum(
                jnp.linalg.norm(recon, axis=-1)
                * jnp.linalg.norm(target_data, axis=-1), 1e-8)
            rec_loss = (0.1 * jnp.mean(jnp.abs(recon - target_data))
                        + 1.0 - jnp.mean(cos)
                        + 0.1 * jnp.mean((recon - target_data) ** 2))
            return recon, kl, rec_loss

        if z is None:
            z = jax.random.normal(rng, (1, self.bottleneck_size),
                                  self.dtype) * noise_scale_during_inference
        return self._decode(z)
