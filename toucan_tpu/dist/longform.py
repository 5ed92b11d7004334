"""Long-form vocoder synthesis sharded over the time axis (BASELINE.json
config 4: "BigVGAN vocoder synthesis sharded across chips for long-form
audio").

The mel time axis is split across the mesh's 'data' axis; each chip
synthesizes its chunk plus a halo of neighbor frames exchanged over ICI
with ``jax.lax.ppermute`` (ring neighbors), then crops the halo from the
waveform.  The result is bit-identical to unsharded synthesis because the
halo exceeds the generator's receptive field.

Receptive field accounting (mel-frame units): the input conv (k=7) plus
each upsample stage's transposed conv and residual stacks (max span
(11-1)*5 samples at the stage rate) telescope to < 16 mel frames for
HiFiGAN and ~23 for BigVGAN (each alias-free Snake adds ~±4 samples at
its stage rate, 18 acts per stage); HALO_FRAMES = 32 covers both
(~1.5% overhead at 2048-frame chunks).

Global-edge handling: the chunks at the sequence boundary use *shifted*
windows (no synthetic halo) so the generator applies its own edge
semantics — conv zero-padding, BigVGAN's replicate-padded resamplers — at
the true sequence edge exactly as the unsharded call would.  A zero or
replicated fake halo there would contaminate the first/last receptive
field of output with any trained (nonzero-bias) checkpoint.
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
    if n == 1:
        return vocoder.apply(variables, mel[None])[0, :, 0]
    assert chunk >= 2 * halo, "chunks must cover two halos"

    def local_synthesis(mel_local):
        """mel_local (chunk, 80) on each device."""
        idx = jax.lax.axis_index(axis)
        right_of = [(i, (i + 1) % n) for i in range(n)]
        left_of = [(i, (i - 1) % n) for i in range(n)]
        # ring exchange over ICI: each device receives the left neighbor's
        # last 2*halo frames and the right neighbor's first 2*halo frames
        # (the doubled span feeds the shifted windows of the edge chunks)
        left1 = jax.lax.ppermute(mel_local[-halo:], axis, right_of)
        left2 = jax.lax.ppermute(mel_local[-2 * halo:-halo], axis, right_of)
        right1 = jax.lax.ppermute(mel_local[:halo], axis, left_of)
        right2 = jax.lax.ppermute(mel_local[halo:2 * halo], axis, left_of)

        # interior chunks: symmetric halo.  Global-edge chunks: a window
        # shifted fully inside the sequence, so the generator's own edge
        # semantics apply at the true sequence boundary (exactness with
        # nonzero biases / replicate-padded resamplers).
        first = jnp.concatenate([mel_local, right1, right2], axis=0)
        inner = jnp.concatenate([left1, mel_local, right1], axis=0)
        last = jnp.concatenate([left2, left1, mel_local], axis=0)
        extended = jnp.where(idx == 0, first,
                             jnp.where(idx == n - 1, last, inner))
        wave = vocoder.apply(variables, extended[None])[0, :, 0]

        offset = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2 * halo, halo))
        return jax.lax.dynamic_slice(wave, (offset * SAMPLES_PER_FRAME,),
                                     (chunk * SAMPLES_PER_FRAME,))

    fn = shard_map(local_synthesis, mesh=mesh, in_specs=P(axis),
                   out_specs=P(axis), check_rep=False)
    return fn(mel)


def synthesize_longform(vocoder, variables, mel: np.ndarray, mesh: Mesh,
                        axis: str = "data", halo: int = HALO_FRAMES):
    """Convenience wrapper: pads T to a shard multiple, runs the sharded
    synthesis, trims back to T*384 samples.

    When padding was needed, the last ``halo`` frames' waveform is patched
    with a small unsharded synthesis of the true tail window, because the
    zero-padded sequence puts the generator's edge semantics at the padded
    boundary instead of the true one (exactness with trained weights)."""
    n = mesh.shape[axis]
    t = len(mel)
    if t < 2 * halo * n:  # too short to shard meaningfully: one device
        return np.asarray(vocoder.apply(variables,
                                        jnp.asarray(mel[None]))[0, :, 0])
    t_pad = (t + n - 1) // n * n
    mel_p = np.zeros((t_pad, mel.shape[1]), np.float32)
    mel_p[:t] = mel
    mel_dev = jax.device_put(jnp.asarray(mel_p),
                             NamedSharding(mesh, P(axis)))
    wave = sharded_vocoder_synthesis(vocoder, variables, mel_dev, mesh,
                                     axis=axis, halo=halo)
    out = np.array(wave)[: t * SAMPLES_PER_FRAME]  # writable copy
    if t_pad != t:
        window = 2 * halo  # true-tail window; first `halo` frames warm up
        tail = np.asarray(vocoder.apply(
            variables, jnp.asarray(mel[t - window:][None]))[0, :, 0])
        keep = (window - halo) * SAMPLES_PER_FRAME
        out[-keep:] = tail[-keep:]
    return out
