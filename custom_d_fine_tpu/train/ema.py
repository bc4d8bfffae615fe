"""Exponential moving average of the full train state (params + batch stats).

Parity target: reference src/dl/train.py:52-73 (ModelEMA): warmup-scheduled
decay = momentum * (1 - exp(-iters / 2000)); blend v = d*v + (1-d)*p over every
floating-point entry of the state dict (incl. BN running stats). Here the EMA
is a pure pytree fold executed inside the jitted train step — no model copy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(iters: jnp.ndarray, momentum: float = 0.9998) -> jnp.ndarray:
    return momentum * (1.0 - jnp.exp(-iters.astype(jnp.float32) / 2000.0))


def ema_update(ema_tree, new_tree, iters: jnp.ndarray, momentum: float = 0.9998):
    d = ema_decay(iters, momentum)

    def blend(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * p.astype(e.dtype)
        return p

    return jax.tree_util.tree_map(blend, ema_tree, new_tree)
