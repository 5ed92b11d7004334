"""Spectrogram discriminator (LSGAN critic over random mel windows).

Behavioral equivalent of the reference
(``TrainingInterfaces/Text_to_Spectrogram/ToucanTTS/SpectrogramDiscriminator.py``):
2D conv stack with frequency-strided downsampling over 100-frame windows,
MSE adversarial losses plus feature matching for the generator.  The random
window extraction replaces the reference's repeat-doubling loop with an
equivalent cyclic gather so it stays jit-compatible.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

WINDOW_FRAMES = 100


class DiscriminatorNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        """y (B, T, F, 1) -> (score (B, 1), feature maps)."""
        fmaps = [y]
        specs = [((3, 9), (1, 1)), ((3, 9), (1, 2)), ((3, 9), (1, 2)),
                 ((3, 9), (1, 2)), ((3, 3), (1, 1))]
        for i, (k, s) in enumerate(specs):
            pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))
            y = nn.Conv(32, k, strides=s, padding=pad, dtype=self.dtype,
                        name=f"conv_{i}")(y)
            fmaps.append(y)
            y = jnp.where(y >= 0, y, 0.1 * y)
        y = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="out")(y)
        fmaps.append(y)
        y = y.reshape(y.shape[0], -1)
        y = nn.Dense(1, dtype=self.dtype, name="fc")(y)
        return y, fmaps


class SpectrogramDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.net = DiscriminatorNet(dtype=self.dtype, name="D")

    def __call__(self, windows):
        return self.net(windows)

    def generator_feedback(self, fake, real):
        """Feature-matching + LSGAN generator loss; critic is frozen by the
        caller (stop_gradient on discriminator params)."""
        score_fake, fmap_fake = self.net(fake)
        _, fmap_real = self.net(real)
        fm = sum(jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
                 for f, r in zip(fmap_fake, fmap_real))
        adv = jnp.mean((score_fake - 1.0) ** 2)
        return fm + adv

    def discriminator_loss(self, fake, real):
        score_fake, _ = self.net(jax.lax.stop_gradient(fake))
        score_real, _ = self.net(real)
        return jnp.mean(score_fake ** 2) + jnp.mean((score_real - 1.0) ** 2)


def random_windows(rng, fake, real, lengths, window: int = WINDOW_FRAMES):
    """Cyclic random 100-frame windows of the unpadded spectrograms.

    (B, L, 80) x2 + lengths -> (B, window, 80, 1) x2.  Equivalent in
    distribution to the reference's repeat-doubling + randint slice
    (toucantts_train_loop.py:240-264) but shape-static.
    """
    b = fake.shape[0]
    starts = jax.random.randint(rng, (b,), 0, jnp.maximum(lengths, 1))
    idx = (starts[:, None] + jnp.arange(window)[None, :]) % jnp.maximum(lengths, 1)[:, None]
    take = jax.vmap(lambda x, i: jnp.take(x, i, axis=0))
    return take(fake, idx)[..., None], take(real, idx)[..., None]
