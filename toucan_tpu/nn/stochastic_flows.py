"""VITS-style stochastic variance predictor (spline flows).

Behavioral equivalent of the reference
(``StochasticToucanTTS/StochasticVariancePredictor.py``): a conditional
normalizing flow over (value, auxiliary) pairs built from dilated
depth-separable convs and piecewise rational-quadratic spline couplings,
with a posterior flow providing the variational bound during training.

Layout is (B, T, C); the spline is fully vectorized (where-masked instead
of boolean indexing).  Randomness comes in through explicit rng keys.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

MIN_BIN_WIDTH = 1e-3
MIN_BIN_HEIGHT = 1e-3
MIN_DERIVATIVE = 1e-3


# ------------------------------------------------------------------ spline

def _searchsorted(bin_locations, inputs, eps=1e-6):
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1


def rational_quadratic_spline(inputs, widths_u, heights_u, derivs_u,
                              inverse=False, left=0.0, right=1.0,
                              bottom=0.0, top=1.0):
    num_bins = widths_u.shape[-1]
    widths = jax.nn.softmax(widths_u, axis=-1)
    widths = MIN_BIN_WIDTH + (1 - MIN_BIN_WIDTH * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left).at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = MIN_DERIVATIVE + jax.nn.softplus(derivs_u)

    heights = jax.nn.softmax(heights_u, axis=-1)
    heights = MIN_BIN_HEIGHT + (1 - MIN_BIN_HEIGHT * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom).at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_idx = _searchsorted(cumheights if inverse else cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def take(arr):
        return jnp.take_along_axis(arr, bin_idx, axis=-1)[..., 0]

    in_cumwidths = take(cumwidths[..., :-1])
    in_widths = take(widths)
    in_cumheights = take(cumheights[..., :-1])
    delta = heights / widths
    in_delta = take(delta)
    in_der = take(derivatives[..., :-1]) if derivatives.shape[-1] == num_bins + 1 \
        else take(derivatives)
    in_der_plus = take(derivatives[..., 1:])
    in_heights = take(heights)

    if inverse:
        a = ((inputs - in_cumheights) * (in_der + in_der_plus - 2 * in_delta)
             + in_heights * (in_delta - in_der))
        b = (in_heights * in_der
             - (inputs - in_cumheights) * (in_der + in_der_plus - 2 * in_delta))
        c = -in_delta * (inputs - in_cumheights)
        discriminant = b ** 2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * in_widths + in_cumwidths
        theta_1m = root * (1 - root)
        denom = in_delta + (in_der + in_der_plus - 2 * in_delta) * theta_1m
        der_num = in_delta ** 2 * (in_der_plus * root ** 2
                                   + 2 * in_delta * theta_1m
                                   + in_der * (1 - root) ** 2)
        logabsdet = jnp.log(jnp.maximum(der_num, 1e-12)) - 2 * jnp.log(jnp.maximum(denom, 1e-12))
        return outputs, -logabsdet
    theta = (inputs - in_cumwidths) / in_widths
    theta_1m = theta * (1 - theta)
    numerator = in_heights * (in_delta * theta ** 2 + in_der * theta_1m)
    denom = in_delta + (in_der + in_der_plus - 2 * in_delta) * theta_1m
    outputs = in_cumheights + numerator / denom
    der_num = in_delta ** 2 * (in_der_plus * theta ** 2
                               + 2 * in_delta * theta_1m
                               + in_der * (1 - theta) ** 2)
    logabsdet = jnp.log(jnp.maximum(der_num, 1e-12)) - 2 * jnp.log(jnp.maximum(denom, 1e-12))
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(inputs, widths_u, heights_u,
                                            derivs_u, inverse=False,
                                            tail_bound=5.0):
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    constant = math.log(math.exp(1 - MIN_DERIVATIVE) - 1)
    derivs_u = jnp.pad(derivs_u, [(0, 0)] * (derivs_u.ndim - 1) + [(1, 1)],
                       constant_values=constant)
    safe_inputs = jnp.where(inside, inputs, 0.0)
    out_in, lad_in = rational_quadratic_spline(
        safe_inputs, widths_u, heights_u, derivs_u, inverse,
        left=-tail_bound, right=tail_bound, bottom=-tail_bound, top=tail_bound)
    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, lad_in, 0.0)
    return outputs, logabsdet


# ------------------------------------------------------------------ layers

class FlowLayerNorm(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack with GELU + LayerNorm."""

    channels: int
    kernel_size: int
    n_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic=True):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=dilation,
                        feature_group_count=self.channels, dtype=self.dtype,
                        name=f"sep_{i}")(x * mask)
            y = FlowLayerNorm(self.channels, dtype=self.dtype, name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,), dtype=self.dtype, name=f"pw_{i}")(y)
            y = FlowLayerNorm(self.channels, dtype=self.dtype, name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
            x = x + y
        return x * mask


class ConvFlow(nn.Module):
    filter_channels: int
    kernel_size: int
    n_layers: int = 3
    num_bins: int = 10
    tail_bound: float = 5.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        """x (B, T, 2); mask (B, T, 1)."""
        x0, x1 = x[..., :1], x[..., 1:]
        h = nn.Conv(self.filter_channels, (1,), dtype=self.dtype, name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers,
                    dtype=self.dtype, name="convs")(h, mask, g=g)
        h = nn.Conv(self.num_bins * 3 - 1, (1,), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="proj")(h) * mask

        scale = math.sqrt(self.filter_channels)
        widths = h[..., :self.num_bins] / scale
        heights = h[..., self.num_bins:2 * self.num_bins] / scale
        derivs = h[..., 2 * self.num_bins:]

        x1_out, logabsdet = unconstrained_rational_quadratic_spline(
            x1[..., 0], widths, heights, derivs, inverse=reverse,
            tail_bound=self.tail_bound)
        x_out = jnp.concatenate([x0, x1_out[..., None]], axis=-1) * mask
        if reverse:
            return x_out
        logdet = jnp.sum(logabsdet[..., None] * mask, axis=(1, 2))
        return x_out, logdet


class ElementwiseAffine(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, reverse=False):
        m = self.param("m", nn.initializers.zeros, (self.channels,), self.dtype)
        logs = self.param("logs", nn.initializers.zeros, (self.channels,), self.dtype)
        if reverse:
            return (x - m) * jnp.exp(-logs) * mask
        y = (m + jnp.exp(logs) * x) * mask
        logdet = jnp.sum(logs * mask, axis=(1, 2))
        return y, logdet


def _flip(x):
    return x[..., ::-1]


class StochasticVariancePredictor(nn.Module):
    """Forward: per-sample NLL of targets w (B, T, 1).  Reverse: sample."""

    in_channels: int
    kernel_size: int
    dropout: float = 0.5
    n_flows: int = 4
    cond_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pre = nn.Conv(self.in_channels, (1,), dtype=self.dtype)
        self.proj = nn.Conv(self.in_channels, (1,), dtype=self.dtype)
        self.convs = DDSConv(self.in_channels, self.kernel_size, 3,
                             self.dropout, dtype=self.dtype)
        if self.cond_channels:
            self.cond = nn.Conv(self.in_channels, (1,), dtype=self.dtype)

        self.affine = ElementwiseAffine(2, dtype=self.dtype)
        self.conv_flows = [ConvFlow(self.in_channels, self.kernel_size,
                                    dtype=self.dtype, name=f"flow_{i}")
                           for i in range(self.n_flows)]

        self.post_pre = nn.Conv(self.in_channels, (1,), dtype=self.dtype)
        self.post_proj = nn.Conv(self.in_channels, (1,), dtype=self.dtype)
        self.post_convs = DDSConv(self.in_channels, self.kernel_size, 3,
                                  self.dropout, dtype=self.dtype)
        self.post_affine = ElementwiseAffine(2, dtype=self.dtype)
        self.post_conv_flows = [ConvFlow(self.in_channels, self.kernel_size,
                                         dtype=self.dtype, name=f"post_flow_{i}")
                                for i in range(4)]

    def _condition(self, x, mask, g):
        x = self.pre(x)
        if g is not None and self.cond_channels:
            x = x + self.cond(jax.lax.stop_gradient(g))
        x = self.convs(x, mask)
        return self.proj(x) * mask

    def nll(self, x, mask, w, g=None, rng=None):
        """x (B, T, C) encodings; w (B, T, 1) targets; mask (B, T, 1)."""
        x = self._condition(x, mask, g)

        h_w = self.post_pre(w)
        h_w = self.post_convs(h_w, mask)
        h_w = self.post_proj(h_w) * mask
        e_q = jax.random.normal(rng, w.shape[:2] + (2,), self.dtype) * mask
        z_q = e_q
        logdet_tot_q = 0.0
        z_q, ld = self.post_affine(z_q, mask)
        logdet_tot_q += ld
        for flow in self.post_conv_flows:
            z_q, ld = flow(z_q, mask, g=(x + h_w))
            logdet_tot_q += ld
            z_q = _flip(z_q)
        # NOTE: the reference applies Flip as part of its flow list; flipping
        # after each ConvFlow reproduces the same composition
        z_u, z1 = z_q[..., :1], z_q[..., 1:]
        u = jax.nn.sigmoid(z_u) * mask
        z0 = (w - u) * mask
        logdet_tot_q += jnp.sum((jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u))
                                * mask, axis=(1, 2))
        logq = (jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q ** 2) * mask, axis=(1, 2))
                - logdet_tot_q)

        logdet_tot = 0.0
        z0 = jnp.clip(z0, 1e-6, None)
        y0 = jnp.log(z0) * mask
        logdet_tot += jnp.sum(-y0, axis=(1, 2))
        z = jnp.concatenate([y0, z1], axis=-1)
        z, ld = self.affine(z, mask)
        logdet_tot += ld
        for flow in self.conv_flows:
            z, ld = flow(z, mask, g=x)
            logdet_tot += ld
            z = _flip(z)
        nll = (jnp.sum(0.5 * (math.log(2 * math.pi) + z ** 2) * mask, axis=(1, 2))
               - logdet_tot)
        return nll + logq

    def sample(self, x, mask, g=None, rng=None, noise_scale: float = 0.3):
        x = self._condition(x, mask, g)
        z = jax.random.normal(rng, x.shape[:2] + (2,), self.dtype) * noise_scale
        # the reference's reversed flow list drops the first-trained ConvFlow
        # ("remove a useless vflow") but keeps the flip in front of the affine
        for flow in list(reversed(self.conv_flows))[:-1]:
            z = _flip(z)
            z = flow(z, mask, g=x, reverse=True)
        z = _flip(z)
        z = self.affine(z, mask, reverse=True)
        return z[..., :1]

    def __call__(self, x, mask, w, g=None, rng=None):
        return self.nll(x, mask, w, g=g, rng=rng)
