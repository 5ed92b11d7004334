"""Artificial-speaker embedding WGAN (sampler + controllability + training).

Behavioral equivalent of ``InferenceInterfaces/Controllability/``:

* ResNet generator/critic over speaker embeddings rendered as small square
  "images" (``wgan/resnet_1.py``);
* GanWrapper: pre-sampled latent bank, PCA + least-squares controllability
  basis, slider-driven embedding edits (``GAN.py:20-77``);
* WGAN-QC training (``wgan/wgan_qc.py``): critic regresses to the potentials
  of an exact per-batch optimal transport plan; the LP the reference solves
  with cvxopt/GLPK is solved host-side with scipy's HiGHS — same program,
  same solution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


class ResNetBlock(nn.Module):
    fout: int
    use_bn: bool = True
    res_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fin = x.shape[-1]
        fhidden = min(fin, self.fout)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        if fin != self.fout:
            x_s = nn.Conv(self.fout, (1, 1), use_bias=False, dtype=self.dtype,
                          name="conv_s")(x)
            if self.use_bn:
                x_s = bn("bn_s")(x_s)
        else:
            x_s = x
        dx = nn.Conv(fhidden, (3, 3), use_bias=not self.use_bn, dtype=self.dtype,
                     name="conv_0")(x)
        if self.use_bn:
            dx = bn("bn_0")(dx)
        dx = _lrelu(dx)
        dx = nn.Conv(self.fout, (3, 3), use_bias=not self.use_bn, dtype=self.dtype,
                     name="conv_1")(dx)
        if self.use_bn:
            dx = bn("bn_1")(dx)
        return _lrelu(x_s + self.res_ratio * dx)


class ResNetG(nn.Module):
    data_dim: int = 64
    z_dim: int = 32
    size: int = 4
    nfilter: int = 64
    nfilter_max: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False, return_intermediate: bool = False):
        import math
        s0, nf = 4, self.nfilter
        nlayers = int(math.log2(self.size / s0))
        nf0 = min(self.nfilter_max, nf * 2 ** (nlayers + 1))

        out = nn.Dense(nf0 * s0 * s0, dtype=self.dtype, name="fc")(z)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1d")(out)
        out = _lrelu(out)
        intermediate = out
        out = out.reshape(z.shape[0], nf0, s0, s0).transpose(0, 2, 3, 1)  # NHWC

        idx = 0
        for i in range(nlayers, 0, -1):
            nf1 = min(nf * 2 ** i, self.nfilter_max)
            out = ResNetBlock(nf1, dtype=self.dtype, name=f"block_{idx}")(out, train)
            b, h, w, c = out.shape
            out = jax.image.resize(out, (b, h * 2, w * 2, c), method="nearest")
            idx += 1
        out = ResNetBlock(min(nf, self.nfilter_max), dtype=self.dtype,
                          name=f"block_{idx}")(out, train)
        out = ResNetBlock(min(nf, self.nfilter_max), dtype=self.dtype,
                          name=f"block_{idx + 1}")(out, train)

        out = nn.Conv(3, (3, 3), dtype=self.dtype, name="conv_img")(out)
        out = _lrelu(out)
        # reference flattens the (B, 3, H, W) torch layout
        out = out.transpose(0, 3, 1, 2).reshape(z.shape[0], -1)
        out = nn.Dense(self.data_dim, dtype=self.dtype, name="fc_out")(out)
        if return_intermediate:
            return out, jax.lax.stop_gradient(intermediate)
        return out


class ResNetD(nn.Module):
    data_dim: int = 64
    size: int = 4
    nfilter: int = 64
    nfilter_max: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math
        s0, nf = 4, self.nfilter
        nlayers = int(math.log2(self.size / s0))
        nf0_final = min(self.nfilter_max, nf * 2 ** nlayers)

        out = nn.Dense(3 * self.size * self.size, dtype=self.dtype, name="fc_input")(x)
        out = _lrelu(out).reshape(x.shape[0], 3, self.size, self.size)
        out = out.transpose(0, 2, 3, 1)  # NHWC
        out = _lrelu(nn.Conv(nf, (3, 3), dtype=self.dtype, name="conv_img")(out))

        out = ResNetBlock(min(nf, self.nfilter_max), use_bn=False,
                          dtype=self.dtype, name="block_0")(out)
        out = ResNetBlock(min(nf * 2, self.nfilter_max), use_bn=False,
                          dtype=self.dtype, name="block_1")(out)
        idx = 2
        for i in range(1, nlayers + 1):
            out = nn.avg_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                              count_include_pad=True)
            out = ResNetBlock(min(nf * 2 ** (i + 1), self.nfilter_max), use_bn=False,
                              dtype=self.dtype, name=f"block_{idx}")(out)
            idx += 1
        out = out.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, name="fc")(out)


# ------------------------------------------------------------------ wrapper

class GanWrapper:
    """Sampler + PCA slider control over a trained embedding generator."""

    def __init__(self, g_variables, generator: Optional[ResNetG] = None,
                 num_latents: int = 1100, num_pca_samples: int = 50000,
                 seed: int = 0):
        self.generator = generator or ResNetG()
        self.g_variables = g_variables
        rng = jax.random.PRNGKey(seed)
        z_rng, pca_rng = jax.random.split(rng)
        self.z_list = jax.random.normal(
            z_rng, (num_latents, self.generator.z_dim))
        self.z = self.z_list[0]
        self.U = self._compute_controllability(pca_rng, num_pca_samples)

    def _generate(self, z):
        return self.generator.apply(self.g_variables, z)

    def _compute_controllability(self, rng, n_samples):
        z = jax.random.normal(rng, (n_samples, self.generator.z_dim))
        # batched to keep memory flat
        outs = []
        for i in range(0, n_samples, 5000):
            _, inter = self.generator.apply(self.g_variables, z[i:i + 5000],
                                            return_intermediate=True)
            outs.append(np.asarray(inter))
        intermediate = np.concatenate(outs)
        zs = np.asarray(z)
        # PCA (low-rank, like torch.pca_lowrank default q=6) then lstsq to z
        mu = intermediate.mean()
        centered = intermediate - mu
        _, _, vt = np.linalg.svd(centered - centered.mean(0), full_matrices=False)
        basis = vt[:6].T  # (D, 6)
        x_proj = centered @ basis  # (N, 6)
        u, *_ = np.linalg.lstsq(x_proj, zs, rcond=None)  # (6, z_dim)
        return jnp.asarray(u)

    def set_latent(self, seed: int):
        self.z = self.z_list[seed % len(self.z_list)]

    def reset_default_latent(self, rng=None):
        rng = rng or jax.random.PRNGKey(np.random.randint(2 ** 31))
        self.z = jax.random.normal(rng, (self.generator.z_dim,))

    def modify_embed(self, slider_vector) -> np.ndarray:
        """z + U^T x -> G(z): a 6-dim slider vector edits the voice."""
        x = jnp.asarray(slider_vector, jnp.float32)
        z_new = self.z + self.U.T @ x
        return np.asarray(self._generate(z_new[None]))[0]


# ----------------------------------------------------------------- trainer

class WganQCState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Any
    d_opt_state: Any


def solve_ot_lp(distance: np.ndarray):
    """Solve the reference's OT dual LP exactly (scipy HiGHS instead of
    cvxopt/GLPK): min c^T x s.t. x_r[i] - x_f[j] <= d[i, j], with the same
    zero-mean offset normalization.  Returns (potentials x, plan duals z)."""
    from scipy.optimize import linprog

    b = distance.shape[0]
    n = 2 * b
    # variable layout [x_real (b), x_fake (b)]
    c = np.concatenate([-np.ones(b) / b, np.ones(b) / b])
    # constraint rows ordered like the reference: for column j, all rows i
    rows = []
    a_ub = np.zeros((b * b, n))
    for j in range(b):
        for i in range(b):
            rows.append(distance[i, j])
    row_idx = np.arange(b * b)
    i_idx = np.tile(np.arange(b), b)
    j_idx = np.repeat(np.arange(b), b)
    a_ub[row_idx, i_idx] = 1.0
    a_ub[row_idx, b + j_idx] = -1.0
    res = linprog(c, A_ub=a_ub, b_ub=np.asarray(rows), bounds=(None, None),
                  method="highs")
    x = res.x - 0.5 * res.x.sum() / b
    duals = -res.ineqlin.marginals  # OT plan weights per (i, j) row
    return x, duals.reshape(b, b)


def make_wgan_qc_train_step(generator: ResNetG, critic: ResNetD, g_opt, d_opt,
                            gamma: float = 0.1):
    data_dim = generator.data_dim
    k_const = 1.0 / data_dim
    kr = float(np.sqrt(k_const))
    lam = 2 * kr * gamma * 2

    def distance_matrix(real, fake):
        dif = real[:, None, :] - fake[None, :, :]
        return k_const * 0.5 * jnp.sum(dif ** 2, axis=-1)

    @jax.jit
    def sample_fake(state, z):
        fake, updates = generator.apply(
            {"params": state.g_params, "batch_stats": state.g_batch_stats},
            z, train=True, mutable=["batch_stats"])
        return fake, updates["batch_stats"]

    @jax.jit
    def critic_step(state, real, fake, real_ordered, target):
        def loss_fn(d_params):
            out_real = critic.apply({"params": d_params}, real)[:, 0]
            out_fake_fn = lambda f: critic.apply({"params": d_params}, f)[:, 0]
            out_fake = out_fake_fn(fake)
            l2_real = (out_real.mean() - target[:real.shape[0]].mean()) ** 2
            l2_fake = jnp.mean((out_fake - target[real.shape[0]:]) ** 2)
            l2 = 0.5 * l2_real + 0.5 * l2_fake
            # OT regularization: ||grad_x D(fake)|| matched to transport rays
            grads_x = jax.vmap(jax.grad(lambda f: out_fake_fn(f[None])[0]))(fake)
            gnorm = jnp.linalg.norm(grads_x.reshape(fake.shape[0], -1), axis=1)
            diff_norm = jnp.linalg.norm((real_ordered - fake).reshape(fake.shape[0], -1),
                                        axis=1)
            reg = 0.5 * jnp.mean((gnorm / (2 * kr) - kr / 2 * diff_norm) ** 2)
            total = l2 + lam * reg
            return total, (out_real.mean() - out_fake.mean())

        (loss, wd), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, state.d_params)
        return state.replace(d_params=optax.apply_updates(state.d_params, updates),
                             d_opt_state=d_opt_state), loss, wd

    @jax.jit
    def generator_step(state, z):
        def loss_fn(g_params):
            fake, updates = generator.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                z, train=True, mutable=["batch_stats"])
            score = critic.apply(
                {"params": jax.lax.stop_gradient(state.d_params)}, fake)[:, 0]
            return -score.mean(), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params)
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        return state.replace(g_params=optax.apply_updates(state.g_params, updates),
                             g_batch_stats=new_stats, g_opt_state=g_opt_state,
                             step=state.step + 1), loss

    def train_step(state, real_batch, rng):
        z = jax.random.normal(rng, (real_batch.shape[0], generator.z_dim))
        fake, new_stats = sample_fake(state, z)
        state = state.replace(g_batch_stats=new_stats)
        dist = np.asarray(distance_matrix(jnp.asarray(real_batch), fake))
        potentials, plan = solve_ot_lp(dist)
        mapping = np.argmax(plan, axis=0)
        real_ordered = np.asarray(real_batch)[mapping]
        target = jnp.asarray(potentials, jnp.float32)
        state, d_loss, wd = critic_step(state, jnp.asarray(real_batch), fake,
                                        jnp.asarray(real_ordered), target)
        state, g_loss = generator_step(state, z)
        return state, {"D": float(d_loss), "WD": float(wd), "G": float(g_loss)}

    return train_step


def create_wgan_qc_state(rng, generator: Optional[ResNetG] = None,
                         critic: Optional[ResNetD] = None, lr=1e-4,
                         betas=(0.5, 0.999)):
    generator = generator or ResNetG()
    critic = critic or ResNetD()
    g_vars = generator.init(rng, jnp.zeros((2, generator.z_dim)), train=True)
    d_vars = critic.init(rng, jnp.zeros((2, generator.data_dim)))
    g_opt = optax.adam(lr, b1=betas[0], b2=betas[1])
    d_opt = optax.adam(lr, b1=betas[0], b2=betas[1])
    state = WganQCState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        g_opt_state=g_opt.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_opt_state=d_opt.init(d_vars["params"]),
    )
    return state, generator, critic, g_opt, d_opt
