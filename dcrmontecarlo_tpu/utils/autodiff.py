"""Differential operators on scalar fields via JAX autodiff (C7 rebuild).

The reference computes gradients/Laplacians of user coefficient callables
with *runtime* nested ``torch.autograd.grad`` per walker step
(``utils.py:11-63``, called from ``solvers/WoStSolver.py:105-115``) — its
single biggest CPU cost. Here fields are jnp-traceable functions of scalar
coordinates ``f(x, y)``, differentiated at *trace time* with ``jax.grad``;
the resulting expressions compile into the fused walker step at zero
interpretive cost and vectorize over walker batches with ``vmap``.
"""

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["gradient", "laplacian", "value_grad_laplacian"]


def gradient(f: Callable) -> Callable:
    """``grad f`` of a scalar field ``f(x, y)`` -> ``(fx, fy)``.

    Equivalent of reference ``torchGradient`` (``utils.py:11-33``) but
    returns a *function*, composable under jit/vmap.
    """
    fx = jax.grad(f, argnums=0)
    fy = jax.grad(f, argnums=1)

    def grad_f(x, y):
        return fx(x, y), fy(x, y)

    return grad_f


def laplacian(f: Callable) -> Callable:
    """``lap f`` of a scalar field ``f(x, y)``.

    Equivalent of reference ``torchLaplacian`` (``utils.py:35-63``): trace
    of the Hessian via forward-over-reverse second derivatives.
    """
    fxx = jax.grad(jax.grad(f, argnums=0), argnums=0)
    fyy = jax.grad(jax.grad(f, argnums=1), argnums=1)

    def lap_f(x, y):
        return fxx(x, y) + fyy(x, y)

    return lap_f


def value_grad_laplacian(f: Callable) -> Callable:
    """Fused ``(f, grad f, lap f)`` evaluation of a scalar field."""
    g = gradient(f)
    l = laplacian(f)

    def eval_f(x, y):
        gx, gy = g(x, y)
        return f(x, y), (gx, gy), l(x, y)

    return eval_f
