"""Weight-norm / spectral-norm conv reparameterizations (training-time).

The reference applies ``torch.nn.utils.weight_norm`` to every discriminator
conv and ``spectral_norm`` to the first multi-scale discriminator
(``HiFiGAN_Discriminators.py:365-372`` follow_official_norm;
``AvocodoDiscriminators.py:147-201``).  For the *generator* these norms are
folded at checkpoint conversion (inference is unaffected), but for the
critics they are live reparameterizations that shape GAN training dynamics,
so the TPU build replicates them:

 * weight norm: w = g * v / ||v||, with the norm taken per output channel
   over all other axes (torch's default dim=0 on its (out, in, k) layout).
   Parameters are stored as (v, g) exactly like torch's weight_g/weight_v,
   so reference discriminator checkpoints map 1:1.
 * spectral norm: w = kernel / sigma_max(W), sigma estimated with one
   power-iteration step per call (torch semantics); the left singular
   vector estimate lives in a mutable "spectral" variable collection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


class NormedConv(nn.Module):
    """1D/2D conv with optional weight- or spectral-norm reparameterization.

    Kernel layout is flax-style (*k, in/groups, out).  norm in
    {"none", "weight", "spectral"}.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = None
    padding: str = "SAME"
    feature_group_count: int = 1
    kernel_dilation: Tuple[int, ...] = None
    norm: str = "weight"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_feats = x.shape[-1] // self.feature_group_count
        kshape = tuple(self.kernel_size) + (in_feats, self.features)
        init = nn.initializers.lecun_normal()
        if self.norm == "weight":
            v = self.param("v", init, kshape, jnp.float32)
            g = self.param("g", lambda rng: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0))
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            kernel = v * (g / jnp.maximum(norm, 1e-12))
        elif self.norm == "spectral":
            kernel = self.param("kernel", init, kshape, jnp.float32)
            w_mat = kernel.reshape(-1, self.features).T  # (out, rest) like torch
            # stateless power iteration: fixed deterministic start + 30
            # steps per call (torch keeps a persistent u buffer and does one
            # step per forward; the stateless form avoids threading a mutable
            # collection through the GAN train state and converges to the
            # same sigma_max — 30 matvecs on a tiny matrix is negligible)
            u = _l2norm(jax.random.normal(jax.random.PRNGKey(7),
                                          (self.features,), jnp.float32))
            w_stop = jax.lax.stop_gradient(w_mat)
            for _ in range(30):
                v = _l2norm(w_stop.T @ u)
                u = _l2norm(w_stop @ v)
            sigma = u @ (w_mat @ v)
            kernel = kernel / sigma
        else:
            kernel = self.param("kernel", init, kshape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dn = ("NHC", "HIO", "NHC") if len(self.kernel_size) == 1 else \
             ("NHWC", "HWIO", "NHWC")
        strides = self.strides or (1,) * len(self.kernel_size)
        dil = self.kernel_dilation or (1,) * len(self.kernel_size)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=strides, padding=self.padding,
            rhs_dilation=dil, dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        return y + bias.astype(self.dtype)
