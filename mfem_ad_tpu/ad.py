"""AD point-functions: scalar energies and their derivatives via JAX.

This is the TPU-native replacement for the reference's entire AD core
(/root/reference/src/ad_native.{hpp,cpp}):

- ``ADReal_t``/``AD2Real_t`` dual and nested-dual types (ad_native.hpp:41-49)
  -> JAX tracing.  One plain Python energy ``f(x, params) -> scalar``
  replaces the three ``AD_IMPL`` type instantiations (ad_native.hpp:332-365).
- ``ADFunction::Gradient`` (n seeded forward passes, ad_native.cpp:188-201)
  -> ``jax.grad`` (one reverse pass).
- ``ADFunction::Hessian`` (n(n+1)/2 nested-dual passes, ad_native.cpp:211-230)
  -> ``jax.jacfwd(jax.grad(f))`` (forward-over-reverse).
- dual ``max``/``min`` with subgradient tie-averaging (ad_native.hpp:695-749)
  -> ``admax``/``admin`` below.

Parameters: the reference's ``Evaluator`` machinery is replaced by a dict of
per-qp arrays; each energy declares named ``Coefficient`` sources in
``self.params`` and receives the evaluated per-qp slice as ``p``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coefficients import Coefficient, as_coefficient

__all__ = [
    "ADFunction",
    "ADVectorFunction",
    "admax",
    "admin",
    "MassEnergy",
    "DiffusionEnergy",
    "DiffEnergy",
    "LinearElasticityEnergy",
    "Lagrangian",
    "ALFunctional",
]


def admax(a, b):
    """max with subgradient-consistent tie handling (average at equality).

    Mirrors the dual max overload at reference ad_native.hpp:695-721: at a
    tie the derivative is the average of the two branches' derivatives.
    """
    return jnp.where(a > b, a, jnp.where(a < b, b, 0.5 * (a + b)))


def admin(a, b):
    """min with subgradient tie-averaging (ad_native.hpp:723-749)."""
    return jnp.where(a < b, a, jnp.where(a > b, b, 0.5 * (a + b)))


class ADFunction:
    """Scalar point-function f: R^n -> R, differentiated by JAX.

    Subclass and implement ``energy(self, x, p)`` (the analogue of an
    ``AD_IMPL`` body), or pass a callable.  ``params`` maps names to
    Coefficient-convertible sources, evaluated per quadrature point at
    assembly time; for standalone use pass a dict of arrays directly.
    """

    def __init__(self, n_input: int, fn=None, params: dict | None = None):
        self.n_input = int(n_input)
        if fn is not None:
            self.energy = fn  # type: ignore[method-assign]
        self.params: dict[str, Coefficient] = {}
        for k, v in (params or {}).items():
            self.add_parameter(k, v)

    def add_parameter(self, name: str, src):
        self.params[name] = as_coefficient(src)

    # -- energy body: override me ---------------------------------------
    def energy(self, x, p):
        raise NotImplementedError

    # -- evaluation & derivatives ----------------------------------------
    def __call__(self, x, p=None):
        return self.energy(jnp.asarray(x), p or {})

    def gradient(self, x, p=None):
        return jax.grad(lambda y: self.energy(y, p or {}))(jnp.asarray(x))

    def hessian(self, x, p=None):
        f = lambda y: self.energy(y, p or {})  # noqa: E731
        return jax.jacfwd(jax.grad(f))(jnp.asarray(x))

    def value_grad_hess(self, x, p=None):
        p = p or {}
        x = jnp.asarray(x)
        f = lambda y: self.energy(y, p)  # noqa: E731
        return f(x), jax.grad(f)(x), jax.jacfwd(jax.grad(f))(x)


class ADVectorFunction:
    """Vector point-function F: R^n -> R^m (reference ad_native.hpp:198-265).

    ``gradient`` returns the m-by-n Jacobian (ad_native.cpp:232-250);
    ``hessian`` returns the [m, n, n] stack of component Hessians (the
    reference's DenseTensor H(i,j,k) = d2 F_k / dx_i dx_j, transposed to
    component-major).
    """

    def __init__(self, n_input: int, n_output: int, fn=None, params=None):
        self.n_input = int(n_input)
        self.n_output = int(n_output)
        if fn is not None:
            self.function = fn  # type: ignore[method-assign]
        self.params: dict[str, Coefficient] = {}
        for k, v in (params or {}).items():
            self.params[k] = as_coefficient(v)

    def function(self, x, p):
        raise NotImplementedError

    def __call__(self, x, p=None):
        return self.function(jnp.asarray(x), p or {})

    def gradient(self, x, p=None):
        return jax.jacfwd(lambda y: self.function(y, p or {}))(jnp.asarray(x))

    def hessian(self, x, p=None):
        f = lambda y: self.function(y, p or {})  # noqa: E731
        return jax.jacfwd(jax.jacfwd(f))(jnp.asarray(x))


# ---------------------------------------------------------------------------
# Built-in energy library (reference ad_native.hpp:413-691)
# ---------------------------------------------------------------------------


class MassEnergy(ADFunction):
    """0.5 ||x||^2 (ad_native.hpp:413-420)."""

    def energy(self, x, p):
        return 0.5 * jnp.dot(x, x)


class DiffusionEnergy(ADFunction):
    """0.5 grad^T K grad with scalar/vector/matrix K (ad_native.hpp:421-481).

    K may be omitted (identity), or a Coefficient of size 1, dim, or dim^2.
    """

    def __init__(self, dim: int, K=None):
        super().__init__(dim)
        self.dim = dim
        if K is not None:
            self.add_parameter("K", K)
            ksize = self.params["K"].size
            if ksize not in (1, dim, dim * dim):
                raise ValueError(
                    f"K must have size 1, {dim} or {dim*dim}, got {ksize}"
                )

    def energy(self, g, p):
        K = p.get("K")
        if K is None:
            return 0.5 * jnp.dot(g, g)
        if K.shape[-1] == 1:
            return 0.5 * K[0] * jnp.dot(g, g)
        if K.shape[-1] == self.dim:
            return 0.5 * jnp.sum(K * g * g)
        Km = K.reshape(self.dim, self.dim)
        return 0.5 * jnp.dot(g, Km @ g)


class DiffEnergy(ADFunction):
    """f(x - target) for a wrapped energy f (ad_native.hpp:483-525)."""

    def __init__(self, base: ADFunction, target=None):
        super().__init__(base.n_input)
        self.base = base
        if target is not None:
            self.add_parameter("target", target)

    def energy(self, x, p):
        return self.base.energy(x - p["target"], p)


class LinearElasticityEnergy(ADFunction):
    """0.5 lambda (div u)^2 + mu ||sym grad u||^2 (ad_native.hpp:527-566).

    Input is the flattened gradient gradu[i*dim + j] = d u_i / d x_j
    (component-major), exactly the reference's VECTOR|GRAD layout.
    """

    def __init__(self, dim: int, lam, mu):
        super().__init__(dim * dim)
        self.dim = dim
        self.add_parameter("lambda", lam)
        self.add_parameter("mu", mu)

    def energy(self, gradu, p):
        d = self.dim
        G = gradu.reshape(d, d)
        div = jnp.trace(G)
        sym = 0.5 * (G + G.T)
        return 0.5 * p["lambda"][0] * div * div + p["mu"][0] * jnp.sum(sym * sym)


class NeoHookeanEnergy(ADFunction):
    """Compressible neo-Hookean hyperelasticity
    W = mu/2 (tr(F^T F) - d) - mu log(det F) + lambda/2 log^2(det F),
    F = I + grad u.  A genuinely nonlinear vector energy (the Hessian
    depends on the state) — the natural large-deformation upgrade of the
    reference's LinearElasticityEnergy (ad_native.hpp:527-566), same
    flattened VECTOR|GRAD input layout; linearizes to it at grad u -> 0.
    """

    def __init__(self, dim: int, lam, mu):
        super().__init__(dim * dim)
        self.dim = dim
        self.add_parameter("lambda", lam)
        self.add_parameter("mu", mu)

    def energy(self, gradu, p):
        d = self.dim
        F = gradu.reshape(d, d) + jnp.eye(d, dtype=gradu.dtype)
        lam, mu = p["lambda"][0], p["mu"][0]
        I1 = jnp.sum(F * F)
        logJ = jnp.log(jnp.linalg.det(F))
        return 0.5 * mu * (I1 - d) - mu * logJ + 0.5 * lam * logJ * logJ


class Lagrangian(ADFunction):
    """f(x) + sum_i lambda_i c_i(x) (ad_native.hpp:570-621).

    Input is [x (n_obj), lambda (n_con)].  Eval-mode switching mirrors
    FullMode/ObjectiveMode/EqConstraintMode; the mode is a Python-level
    (static) switch, so changing it retraces — modes are set once per solve
    in practice.
    """

    FULL, OBJONLY = -1, -2

    def __init__(self, objective: ADFunction, n_eq_con: int):
        super().__init__(objective.n_input + n_eq_con)
        self.objective = objective
        self.eq_con: list[ADFunction] = []
        self.eval_mode = self.FULL

    def add_eq_constraint(self, c: ADFunction):
        self.eq_con.append(c)
        return self

    def full_mode(self):
        self.eval_mode = self.FULL

    def objective_mode(self):
        self.eval_mode = self.OBJONLY

    def eq_constraint_mode(self, i: int):
        assert 0 <= i < len(self.eq_con)
        self.eval_mode = i

    def energy(self, x_and_lambda, p):
        n = self.objective.n_input
        x = x_and_lambda[:n]
        lam = x_and_lambda[n:]
        if self.eval_mode >= 0:
            return self.eq_con[self.eval_mode].energy(x, p)
        result = self.objective.energy(x, p)
        if self.eval_mode == self.OBJONLY:
            return result
        for i, c in enumerate(self.eq_con):
            result = result + c.energy(x, p) * lam[i]
        return result


class ALFunctional(ADFunction):
    """Augmented Lagrangian f + sum [lam_i c_i + (mu/2) c_i^2]
    (ad_native.hpp:624-691), with c_i(x) = constraint_i(x) - rhs_i.

    ``lam`` and ``penalty`` are JAX-traceable attributes updated between
    solves (SetLambda/SetPenalty equivalents) — pass them via set_multipliers
    so updating them does not retrace.
    """

    FULLAL, OBJONLY = -1, -2

    def __init__(self, objective: ADFunction):
        super().__init__(objective.n_input)
        self.objective = objective
        self.eq_con: list[ADFunction] = []
        self.eq_rhs: list[float] = []
        self.lam = jnp.zeros(0)
        self.penalty = 1.0
        self.eval_mode = self.FULLAL

    def add_eq_constraint(self, c: ADFunction, target: float = 0.0):
        self.eq_con.append(c)
        self.eq_rhs.append(target)
        self.lam = jnp.zeros(len(self.eq_con))
        return self

    def set_multipliers(self, lam):
        self.lam = jnp.asarray(lam)

    def set_penalty(self, mu: float):
        self.penalty = mu

    def al_mode(self):
        self.eval_mode = self.FULLAL

    def objective_mode(self):
        self.eval_mode = self.OBJONLY

    def eq_constraint_mode(self, i: int):
        assert 0 <= i < len(self.eq_con)
        self.eval_mode = i

    def energy(self, x, p):
        if self.eval_mode >= 0:
            i = self.eval_mode
            return self.eq_con[i].energy(x, p) - self.eq_rhs[i]
        result = self.objective.energy(x, p)
        if self.eval_mode == self.OBJONLY:
            return result
        for i, c in enumerate(self.eq_con):
            cx = c.energy(x, p) - self.eq_rhs[i]
            result = result + cx * (self.lam[i] + 0.5 * self.penalty * cx)
        return result


class EmptyEnergy(ADFunction):
    """Zero energy placeholder (reference _dof_pg.hpp:9-15)."""

    def energy(self, x, p):
        return jnp.zeros(())
