"""Coefficients: spatial data sources evaluated at quadrature points.

The reference's ``Evaluator`` (src/ad_native.hpp:51-135, ad_native.cpp:5-179)
is a std::variant over {scalar, Vector, Matrix, Coefficient*, GridFunction*,
QuadratureFunction*} dispatched per quadrature point.  TPU-native, that whole
mechanism collapses to: *evaluate every parameter source once into a dense
``[n_elem, n_qp, size]`` array* before assembly, and hand the energy function
a per-qp slice.  Traced array parameters (e.g. the frozen latent psi_k, the
PG step alpha) stay JAX arrays so updating them does not recompile.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "Coefficient",
    "ConstantCoefficient",
    "FunctionCoefficient",
    "GridFunctionCoefficient",
    "ScalarFieldCoefficient",
    "QuadratureCoefficient",
    "as_coefficient",
]


class Coefficient:
    """Base: something that yields [ne, nq, size] given qp coordinates."""

    size: int = 1

    def eval_qp(self, ctx) -> "np.ndarray":
        """ctx is an AssemblyContext (integrator.py) with .xq [ne,nq,dim]."""
        raise NotImplementedError


class ConstantCoefficient(Coefficient):
    def __init__(self, value):
        self.value = np.atleast_1d(np.asarray(value, dtype=np.float64)).ravel()
        self.size = self.value.size

    def eval_qp(self, ctx):
        ne, nq = ctx.xq.shape[:2]
        return np.broadcast_to(self.value, (ne, nq, self.size))


class FunctionCoefficient(Coefficient):
    """fn(x) with x a [dim] point; scalar or vector valued."""

    def __init__(self, fn, size: int = 1):
        self.fn = fn
        self.size = size

    def eval_qp(self, ctx):
        xq = np.asarray(ctx.xq)
        ne, nq, dim = xq.shape
        flat = xq.reshape(-1, dim)
        vals = np.array([self.fn(x) for x in flat], dtype=np.float64)
        return vals.reshape(ne, nq, self.size)


class GridFunctionCoefficient(Coefficient):
    """Evaluate an FE field at quadrature points.

    Holds a *reference* to (space, getter); the dof vector is supplied at
    assembly time through ``ctx.fields[name]`` so it can be a traced JAX
    array (this is how psi_k enters the PG functional without recompiles —
    cf. reference pg.hpp:106-111 adding the latent GridFunction to the
    Evaluator).
    """

    def __init__(self, space, name: str):
        self.space = space
        self.name = name
        self.size = space.vdim

    def eval_qp(self, ctx):
        return ctx.eval_field(self.space, self.name)


class ScalarFieldCoefficient(Coefficient):
    """A runtime-supplied (traced) scalar/vector parameter, by name.

    Used for quantities that change every outer iteration without
    retracing — e.g. the PG step size alpha (reference pg.hpp:177-180) or
    augmented-Lagrangian multipliers.  The value is taken from the
    ``fields`` dict passed to assembly and broadcast over [ne, nq].
    """

    def __init__(self, name: str, size: int = 1):
        self.name = name
        self.size = size

    def eval_qp(self, ctx):  # resolved inside jit by the integrator
        raise RuntimeError("ScalarFieldCoefficient is resolved at trace time")


class QuadratureCoefficient(Coefficient):
    """Directly supplied per-qp values [ne, nq, size]."""

    def __init__(self, values):
        self.values = values
        self.size = values.shape[-1] if values.ndim == 3 else 1

    def eval_qp(self, ctx):
        v = self.values
        return v if v.ndim == 3 else v[..., None]


def as_coefficient(obj) -> Coefficient:
    if isinstance(obj, Coefficient):
        return obj
    if callable(obj):
        return FunctionCoefficient(obj)
    return ConstantCoefficient(obj)
