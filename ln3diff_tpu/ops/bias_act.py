"""bias + activation (+gain, +clamp) — API parity with the reference's
fused CUDA op (``utils/torch_utils/ops/bias_act.py:112-290``).

On TPU this is a plain jnp chain that XLA fuses into neighboring matmuls;
the custom second-order gradients the CUDA op hand-writes come for free
from JAX autodiff.  Provided as an explicit function so StyleGAN-layer
ports map 1:1.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# (fn, def_gain) per activation — mirrors the reference's activation_funcs.
_ACTS = {
    'linear': (lambda x: x, 1.0),
    'relu': (jax.nn.relu, math.sqrt(2)),
    'lrelu': (lambda x: jax.nn.leaky_relu(x, 0.2), math.sqrt(2)),
    'tanh': (jnp.tanh, 1.0),
    'sigmoid': (jax.nn.sigmoid, 1.0),
    'elu': (jax.nn.elu, 1.0),
    'selu': (jax.nn.selu, 1.0),
    'softplus': (jax.nn.softplus, 1.0),
    'swish': (jax.nn.silu, math.sqrt(2)),
}


def bias_act(x: jax.Array, b: Optional[jax.Array] = None,
             act: str = 'linear', gain: Optional[float] = None,
             clamp: Optional[float] = None, axis: int = -1) -> jax.Array:
    """y = clamp(gain * act(x + b)).

    Args:
      x: any shape; ``b`` broadcasts along ``axis`` (channels-last
        default, vs the reference's NCHW dim=1).
    """
    fn, def_gain = _ACTS[act]
    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)
    x = fn(x)
    g = def_gain if gain is None else gain
    if g != 1.0:
        x = x * g
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
