"""Gradient reversal layer (domain-adversarial training, Ganin & Lempitsky).

Reference: `lib/gradient_reversal_layer/gradient_reversal_op.cc:30-41` —
identity forward, backward multiplies the incoming gradient by -lambda.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x: jnp.ndarray, lambda_: float) -> jnp.ndarray:
    return x


def _fwd(x, lambda_):
    return x, None


def _bwd(lambda_, _res, g):
    return (jnp.asarray(-lambda_, dtype=g.dtype) * g,)


gradient_reversal.defvjp(_fwd, _bwd)
