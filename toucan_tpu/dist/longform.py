"""Long-form vocoder synthesis sharded over the time axis (BASELINE.json
config 4: "BigVGAN vocoder synthesis sharded across chips for long-form
audio").

The mel time axis is split across the mesh's 'data' axis; each chip
synthesizes its chunk plus a halo of neighbor frames exchanged over ICI
with ``jax.lax.ppermute`` (ring neighbors), then crops the halo from the
waveform.  The result is bit-identical to unsharded synthesis because the
halo exceeds the generator's receptive field.

Receptive field accounting (HiFiGAN/BigVGAN, mel-frame units): the input
conv (k=7) plus each upsample stage's transposed conv and residual stacks
(max span (11-1)*5 samples at the stage rate) telescope to < 16 mel
frames; HALO_FRAMES = 32 is comfortably conservative (~1.5% overhead at
2048-frame chunks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HALO_FRAMES = 32
SAMPLES_PER_FRAME = 384


def sharded_vocoder_synthesis(vocoder, variables, mel: jnp.ndarray, mesh: Mesh,
                              axis: str = "data", halo: int = HALO_FRAMES):
    """mel (T, 80) -> wave (T*384,), time-sharded over ``axis`` of ``mesh``.

    T must be divisible by the axis size; callers pad to a multiple (the
    extra frames synthesize silence that gets sliced off).
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    t = mel.shape[0]
    assert t % n == 0, f"mel frames {t} not divisible by {n} shards"
    chunk = t // n
    assert chunk > halo, "chunks must exceed the halo"

    def local_synthesis(mel_local):
        """mel_local (chunk, 80) on each device."""
        idx = jax.lax.axis_index(axis)
        right_of = [(i, (i + 1) % n) for i in range(n)]
        left_of = [(i, (i - 1) % n) for i in range(n)]
        # neighbor edges: receive the left neighbor's last `halo` frames and
        # the right neighbor's first `halo` frames (ring exchange over ICI)
        from_left = jax.lax.ppermute(mel_local[-halo:], axis, right_of)
        from_right = jax.lax.ppermute(mel_local[:halo], axis, left_of)
        # zero the wrapped edges at the sequence boundary
        from_left = jnp.where(idx == 0, 0.0, from_left)
        from_right = jnp.where(idx == n - 1, 0.0, from_right)

        extended = jnp.concatenate([from_left, mel_local, from_right], axis=0)
        wave = vocoder.apply(variables, extended[None])[0, :, 0]

        # boundary-exactness: the generator zero-pads at its input edges, so
        # the first/last chunks must also see zero halos (they do, above);
        # interior chunks crop the halo-generated samples away
        return wave[halo * SAMPLES_PER_FRAME:
                    (halo + chunk) * SAMPLES_PER_FRAME]

    fn = shard_map(local_synthesis, mesh=mesh, in_specs=P(axis),
                   out_specs=P(axis), check_rep=False)
    return fn(mel)


def synthesize_longform(vocoder, variables, mel: np.ndarray, mesh: Mesh,
                        axis: str = "data", halo: int = HALO_FRAMES):
    """Convenience wrapper: pads T to a shard multiple, runs the sharded
    synthesis, trims back to T*384 samples."""
    n = mesh.shape[axis]
    t = len(mel)
    t_pad = (t + n - 1) // n * n
    mel_p = np.zeros((t_pad, mel.shape[1]), np.float32)
    mel_p[:t] = mel
    mel_dev = jax.device_put(jnp.asarray(mel_p),
                             NamedSharding(mesh, P(axis)))
    wave = sharded_vocoder_synthesis(vocoder, variables, mel_dev, mesh,
                                     axis=axis, halo=halo)
    return np.asarray(wave)[: t * SAMPLES_PER_FRAME]
