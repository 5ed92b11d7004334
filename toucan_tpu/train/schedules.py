"""Learning-rate schedules (optax)."""

import jax.numpy as jnp


def toucan_warmup_schedule(peak_lr: float = 1e-3, warmup_steps: int = 8000,
                           max_steps: int = 80000, floor: float = 1e-7):
    """Linear warmup, then the reference's (very slow) linear decay
    (``Utility/WarmupScheduler.py:23-30``)."""

    def schedule(step):
        step = step + 1  # the torch scheduler counts from 1
        warm = peak_lr * jnp.minimum(step / warmup_steps, 1.0)
        scale = 1.0 - ((step - warmup_steps) / max_steps) / (max_steps / 10)
        decay = jnp.maximum(peak_lr * scale, floor)
        return jnp.where(step <= warmup_steps, warm, decay)

    return schedule


def noam_warmup_schedule(peak_lr: float, warmup_steps: int = 25000):
    """ESPnet WarmupLR (``Utility/WarmupScheduler.py:33-60``)."""

    def schedule(step):
        step = step + 1
        return peak_lr * warmup_steps ** 0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5)

    return schedule
