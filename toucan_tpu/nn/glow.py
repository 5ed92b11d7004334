"""PortaSpeech-style normalizing-flow PostNet (Glow).

Behavioral equivalent of the reference post-flow
(``TrainingInterfaces/Text_to_Spectrogram/ToucanTTS/Glow.py``): squeeze
time by 2 into channels, then 18 blocks of [ActNorm -> InvConvNear(LU,
n_split=4) -> affine CouplingBlock with a WaveNet core], conditioned on a
projection of [mel, text] features.  The WaveNet cores' dilated conv +
gate stacks are shared across every 4 consecutive blocks; the per-block
start/end/conditioning 1x1 convs are not.

Everything here is (B, T, C) — channel orderings under squeeze/split match
the reference's (B, C, T) arithmetic exactly (verified by parity tests), so
converted checkpoints line up.  Weight-norm reparameterization is folded at
conversion time; training here uses plain weights.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


# --------------------------------------------------------------- squeeze ops

def squeeze(x, mask=None, n_sqz=2):
    """(B, T, C) -> (B, T//n, n*C); new channel = s*C + c for time offset s."""
    b, t, c = x.shape
    t = (t // n_sqz) * n_sqz
    x = x[:, :t].reshape(b, t // n_sqz, n_sqz * c)
    if mask is not None:
        mask = mask[:, n_sqz - 1::n_sqz]
    else:
        mask = jnp.ones((b, t // n_sqz, 1), dtype=x.dtype)
    return x * mask, mask


def unsqueeze(x, mask=None, n_sqz=2):
    b, t, c = x.shape
    x = x.reshape(b, t * n_sqz, c // n_sqz)
    if mask is not None:
        mask = jnp.repeat(mask, n_sqz, axis=1)
    else:
        mask = jnp.ones((b, t * n_sqz, 1), dtype=x.dtype)
    return x * mask, mask


# ------------------------------------------------------------------- layers

class ActNorm(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, reverse=False):
        logs = self.param("logs", nn.initializers.zeros, (self.channels,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), self.dtype)
        x_len = jnp.sum(mask, axis=(1, 2))  # (B,)
        if reverse:
            z = (x - bias) * jnp.exp(-logs) * mask
            logdet = jnp.sum(-logs) * x_len
        else:
            z = (bias + jnp.exp(logs) * x) * mask
            logdet = jnp.sum(logs) * x_len
        return z, logdet


class InvConvNear(nn.Module):
    """Invertible 1x1 conv over interleaved channel groups, LU-parameterized."""

    channels: int
    n_split: int = 4
    n_sqz: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ns = self.n_split
        # LU factors of a random orthogonal matrix.  The seed is derived from
        # the module path so each block starts with a distinct rotation but
        # init stays reproducible; converted checkpoints overwrite all of it.
        import scipy.linalg
        seed = abs(hash(("invconv", str(self.path)))) % (2 ** 31)
        rng = np.random.RandomState(seed)
        w0, _ = np.linalg.qr(rng.randn(ns, ns))
        if np.linalg.det(w0) < 0:
            w0[:, 0] = -w0[:, 0]
        p0, l0, u0 = scipy.linalg.lu(w0)
        s0 = np.diag(u0)
        self.p = self.variable("buffers", "p", lambda: jnp.asarray(p0, self.dtype))
        self.sign_s = self.variable("buffers", "sign_s",
                                    lambda: jnp.asarray(np.sign(s0), self.dtype))
        self.l = self.param("l", lambda k: jnp.asarray(np.tril(l0, -1), self.dtype))
        self.log_s = self.param("log_s", lambda k: jnp.asarray(np.log(np.abs(s0)), self.dtype))
        self.u = self.param("u", lambda k: jnp.asarray(np.triu(u0, 1), self.dtype))

    def _weight(self):
        ns = self.n_split
        l_mask = jnp.tril(jnp.ones((ns, ns), self.dtype), -1)
        eye = jnp.eye(ns, dtype=self.dtype)
        l = self.l * l_mask + eye
        u = self.u * l_mask.T + jnp.diag(self.sign_s.value * jnp.exp(self.log_s))
        return self.p.value @ l @ u

    def __call__(self, x, mask, reverse=False):
        b, t, c = x.shape
        ns, nq = self.n_split, self.n_sqz
        x_len = jnp.sum(mask, axis=(1, 2))

        # channel split mirroring the reference's view/permute on (B, C, T):
        # c_idx = a*(c/ns*nq... ) — concretely: (a, grp, d) with group g=a*nq+d
        x = x.reshape(b, t, nq, c // ns, ns // nq)
        x = x.transpose(0, 1, 2, 4, 3).reshape(b, t, ns, c // ns)

        logdet = jnp.sum(self.log_s) * (c / ns) * x_len
        if reverse:
            weight = jnp.linalg.inv(self._weight().astype(jnp.float32)).astype(self.dtype)
            logdet = -logdet
        else:
            weight = self._weight()

        z = jnp.einsum("btgk,hg->bthk", x, weight)
        z = z.reshape(b, t, nq, ns // nq, c // ns)
        z = z.transpose(0, 1, 2, 4, 3).reshape(b, t, c) * mask
        return z, logdet


class WNCore(nn.Module):
    """Shared dilated-conv gated stack (in_layers + res_skip_layers)."""

    hidden: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, mask):
        """x (B,T,H); cond (B,T,2H*n_layers) already projected; mask (B,T,1)."""
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = nn.Conv(2 * self.hidden, (self.kernel_size,),
                           kernel_dilation=dilation, dtype=self.dtype,
                           name=f"in_{i}")(x)
            cond_l = cond[..., i * 2 * self.hidden:(i + 1) * 2 * self.hidden]
            acts_in = x_in + cond_l
            acts = jnp.tanh(acts_in[..., :self.hidden]) * nn.sigmoid(acts_in[..., self.hidden:])
            res_skip_ch = 2 * self.hidden if i < self.n_layers - 1 else self.hidden
            res_skip = nn.Conv(res_skip_ch, (1,), dtype=self.dtype, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :self.hidden]) * mask
                output = output + res_skip[..., self.hidden:]
            else:
                output = output + res_skip
        return output * mask


class CouplingBlock(nn.Module):
    """Affine coupling: first half conditions an offset/scale of the second."""

    in_channels: int
    hidden: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    cond_channels: int
    sigmoid_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, g, wn_core, reverse=False):
        half = self.in_channels // 2
        x_0, x_1 = x[..., :half], x[..., half:]

        h = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="start")(x_0) * mask
        cond = nn.Conv(2 * self.hidden * self.n_layers, (1,), dtype=self.dtype,
                       name="cond_layer")(g)
        h = wn_core(h, cond, mask)
        out = nn.Conv(self.in_channels, (1,), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="end")(h)

        m = out[..., :half]
        logs = out[..., half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + nn.sigmoid(logs + 2))
        if reverse:
            z_1 = (x_1 - m) * jnp.exp(-logs) * mask
            logdet = jnp.sum(-logs * mask, axis=(1, 2))
        else:
            z_1 = (m + jnp.exp(logs) * x_1) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))
        return jnp.concatenate([x_0, z_1], axis=-1), logdet


# --------------------------------------------------------------------- Glow

class Glow(nn.Module):
    in_channels: int = 80
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_blocks: int = 18
    n_layers: int = 4
    n_split: int = 4
    n_sqz: int = 2
    text_condition_channels: int = 192
    share_wn_layers: int = 4
    sigmoid_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.g_proj = nn.Conv(self.text_condition_channels, (5,), dtype=self.dtype,
                              name="g_proj")
        n_cores = (self.n_blocks + self.share_wn_layers - 1) // self.share_wn_layers
        self.wn_cores = [WNCore(self.hidden_channels, self.kernel_size, self.dilation_rate,
                                self.n_layers, dtype=self.dtype, name=f"wn_core_{i}")
                         for i in range(n_cores)]
        sq_ch = self.in_channels * self.n_sqz
        self.actnorms = [ActNorm(sq_ch, dtype=self.dtype, name=f"actnorm_{b}")
                         for b in range(self.n_blocks)]
        self.invconvs = [InvConvNear(sq_ch, self.n_split, self.n_sqz, dtype=self.dtype,
                                     name=f"invconv_{b}") for b in range(self.n_blocks)]
        self.couplings = [CouplingBlock(sq_ch, self.hidden_channels, self.kernel_size,
                                        self.dilation_rate, self.n_layers,
                                        self.text_condition_channels * self.n_sqz,
                                        self.sigmoid_scale, dtype=self.dtype,
                                        name=f"coupling_{b}") for b in range(self.n_blocks)]

    def _condition(self, mel_out, encoded_texts, nonpadding=None):
        g = jnp.concatenate([mel_out, encoded_texts], axis=-1)
        if nonpadding is not None:
            g = g * nonpadding  # emulate exact-length zero padding (k=5 conv)
        return self.g_proj(g)

    def _flow(self, x, mask, g, reverse=False):
        x, mask_sq = squeeze(x, mask, self.n_sqz)
        g, _ = squeeze(g, mask, self.n_sqz)
        logdet_tot = jnp.zeros(x.shape[0], dtype=self.dtype)
        order = range(self.n_blocks - 1, -1, -1) if reverse else range(self.n_blocks)
        for b in order:
            core = self.wn_cores[b // self.share_wn_layers]
            steps = [
                lambda xx: self.actnorms[b](xx, mask_sq, reverse),
                lambda xx: self.invconvs[b](xx, mask_sq, reverse),
                lambda xx: self.couplings[b](xx, mask_sq, g, core, reverse),
            ]
            if reverse:
                steps = steps[::-1]
            for step in steps:
                x, logdet = step(x)
                logdet_tot = logdet_tot + logdet
        x, mask = unsqueeze(x, mask_sq, self.n_sqz)
        return x, logdet_tot

    def loss(self, tgt_mels, mel_out, encoded_texts, nonpadding):
        """Training NLL (matches reference ``Glow.forward`` infer=False).

        tgt_mels/mel_out (B, T, 80), encoded_texts (B, T, D),
        nonpadding (B, T, 1) float.
        """
        g = self._condition(mel_out, encoded_texts)
        y_lengths = jnp.sum(nonpadding, axis=(1, 2))
        z, ldj = self._flow(tgt_mels, nonpadding, g, reverse=False)
        ldj = ldj / y_lengths / self.in_channels
        # N(0,1) log-prob averaged over every element (padding included,
        # exactly like the reference).
        log_p = -0.5 * (z ** 2 + _LOG_2PI)
        return -jnp.mean(log_p) - jnp.mean(ldj)

    def sample(self, z, mel_out, encoded_texts, nonpadding=None):
        """Reverse pass: z (B, T, 80) noise -> refined mel (B, T, 80)."""
        if nonpadding is None:
            nonpadding = jnp.ones_like(mel_out[..., :1])
        g = self._condition(mel_out, encoded_texts, nonpadding)
        x, _ = self._flow(z, nonpadding, g, reverse=True)
        return x

    def __call__(self, tgt_mels, mel_out, encoded_texts, nonpadding):
        return self.loss(tgt_mels, mel_out, encoded_texts, nonpadding)
