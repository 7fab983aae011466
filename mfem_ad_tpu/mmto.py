"""Multi-material topology optimization — reference src/mmto.{hpp,cpp}.

The reference's mmto layer is incomplete (not in the CMake lib list,
CMakeLists.txt:17-21; ``SiMPLTopopt::Mult`` is an empty stub,
mmto.hpp:149-151).  This module provides the same components, finished,
the JAX way:

- ``SIMPFunction``            — SIMP interpolation Σ E_i x_i^p (mmto.hpp:9-28)
- ``ParametrizedElasticity``  — elasticity energy with ρ-dependent λ(ρ), μ(ρ)
                                (ParametrizedCompliance, mmto.hpp:154-189)
- design sensitivity          — the reference's ``ParametrizedFunctional``
  hand-chains df/dc = Σ (∂f/∂f_i)(∂f_i/∂c) (mmto.hpp:30-42, mmto.cpp:4-38);
  here the design field ρ enters the energy as a runtime *field* parameter,
  so dC/dρ is literally ``jax.grad`` of the assembled energy with respect
  to the ρ dof vector — no coefficient-perturbation machinery.
- ``SiMPLTopopt``             — a working SiMPL driver (mirror descent with
  the Fermi-Dirac/box entropy + volume-constraint bisection), completing
  the reference's stub.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .ad import ADFunction
from .adeval import ADEval
from .coefficients import GridFunctionCoefficient
from .fespace import FESpace, L2
from .forms import LinearForm, NonlinearForm
from .solvers import cg


class SIMPFunction(ADFunction):
    """SIMP material interpolation: Σ_i E_i x_i^p (mmto.hpp:9-28)."""

    def __init__(self, E, simp_exp: float):
        E = np.atleast_1d(np.asarray(E, dtype=np.float64))
        super().__init__(E.size)
        self.E = jnp.asarray(E)
        self.p = simp_exp

    def energy(self, x, p):
        return jnp.sum(self.E * x**self.p)


class ParametrizedElasticity(ADFunction):
    """Elasticity energy with SIMP-interpolated moduli of a design field.

    Input x = flattened grad u (component-major, as LinearElasticityEnergy);
    the density field rho enters as a runtime field parameter on its own
    (L2) design space, so the energy — and hence residual, Jacobian, and
    the design sensitivity — are all AD-differentiable in rho.

    s(rho) = rho_min + (1 - rho_min) * rho^simp_exp multiplies both lambda
    and mu (single-material ParametrizedCompliance, mmto.hpp:154-189).
    """

    def __init__(self, dim: int, design_space: FESpace, lam: float,
                 mu: float, simp_exp: float = 3.0, rho_min: float = 1e-3):
        super().__init__(dim * dim)
        self.dim = dim
        self.lam0, self.mu0 = lam, mu
        self.simp_exp = simp_exp
        self.rho_min = rho_min
        self.add_parameter("rho", GridFunctionCoefficient(design_space, "rho"))

    def energy(self, gradu, p):
        d = self.dim
        rho = jnp.clip(p["rho"][0], 0.0, 1.0)
        s = self.rho_min + (1.0 - self.rho_min) * rho**self.simp_exp
        G = gradu.reshape(d, d)
        div = jnp.trace(G)
        sym = 0.5 * (G + G.T)
        return s * (0.5 * self.lam0 * div * div + self.mu0 * jnp.sum(sym * sym))


@dataclass
class TopoptResult:
    rho: object
    u: object
    compliance_history: list = field(default_factory=list)
    volume_history: list = field(default_factory=list)


class SiMPLTopopt:
    """SiMPL mirror-descent topology optimization (completes mmto.hpp:111-152).

    min_rho C(rho) = f·u(rho)   s.t.  K(rho) u = f,  mean(rho) = vol_frac,
    0 <= rho <= 1, via Fermi-Dirac mirror descent: latent psi steps along
    -dC/drho, rho = sigmoid(psi + c) with c bisected to meet the volume
    constraint.  dC/drho = -2 dE/drho (self-adjoint compliance) is obtained
    by jax.grad of the assembled energy with respect to the rho dof vector.
    """

    def __init__(
        self,
        state_form: NonlinearForm,
        design_space: FESpace,
        rhs,
        vol_frac: float = 0.4,
        step: float = 10.0,
        lin_tol: float = 1e-10,
        lin_maxiter: int = 5000,
    ):
        self.form = state_form
        self.design_space = design_space
        self.rhs = jnp.asarray(rhs)
        self.vol_frac = vol_frac
        self.step = step
        self.lin_tol = lin_tol
        self.lin_maxiter = lin_maxiter
        # dof "volume" weights for the design space (∫ φ_j)
        from .geometry import geom_factors
        from .quadrature import get_rule

        sp = design_space
        ir = get_rule(sp.mesh.geom, 2 * sp.order + 2)
        gfac = geom_factors(sp.mesh, ir)
        phi = sp.elem.eval(ir.points)
        wj = np.einsum("eq,qd->ed", gfac.w, phi)
        w = np.zeros(sp.ndof)
        np.add.at(w, np.asarray(sp.edof, dtype=np.int64), wj)
        self.dof_volume = jnp.asarray(w)
        self.total_volume = float(w.sum())

    # -- inner state solve (linear elasticity: one Newton step) ----------
    def _solve_state(self, rho, u0):
        fields = {"rho": rho}
        st = self.form.grad_state(jnp.zeros_like(u0), fields)
        d = jnp.abs(self.form.grad_diag(st))
        dsafe = jnp.where(d < 1e-30, 1.0, d)
        u = cg(
            lambda v: self.form.grad_mult(st, v),
            self.rhs,
            x0=u0,
            M=lambda v: v / dsafe,
            tol=self.lin_tol,
            maxiter=self.lin_maxiter,
        )
        return u

    def _volume(self, rho):
        return float(self.dof_volume @ rho) / self.total_volume

    def _project_volume(self, psi):
        """Bisect the sigmoid shift so mean(rho) = vol_frac."""
        lo, hi = -40.0, 40.0
        target = self.vol_frac
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            v = self._volume(jax.nn.sigmoid(psi + mid))
            if v > target:
                hi = mid
            else:
                lo = mid
        c = 0.5 * (lo + hi)
        return psi + c, jax.nn.sigmoid(psi + c)

    def solve(self, max_iter: int = 30, tol: float = 1e-4,
              verbose: bool = False) -> TopoptResult:
        nrho = self.design_space.ndof
        psi = jnp.zeros(nrho)
        psi, rho = self._project_volume(psi)
        u = jnp.zeros(self.form.ndof)
        hist_c, hist_v = [], []

        energy_fn = jax.jit(
            lambda u, rho: self.form.energy(u, {"rho": rho})
        )
        sens_fn = jax.jit(
            lambda u, rho: -2.0 * jax.grad(
                lambda r: self.form.energy(u, {"rho": r})
            )(rho)
        )

        prev_c = np.inf
        for it in range(max_iter):
            u = self._solve_state(rho, u)
            c = float(self.rhs @ u)
            g = sens_fn(u, rho)
            # mirror-descent step in the latent variable (normalized)
            gn = g / (jnp.abs(g).max() + 1e-30)
            psi = psi - self.step * gn
            psi, rho = self._project_volume(psi)
            hist_c.append(c)
            hist_v.append(self._volume(rho))
            if verbose:
                print(
                    f"topopt it {it+1:3d}: compliance={c:.6e} "
                    f"vol={hist_v[-1]:.4f}"
                )
            if abs(prev_c - c) < tol * abs(c):
                break
            prev_c = c
        return TopoptResult(
            rho=rho, u=u, compliance_history=hist_c, volume_history=hist_v
        )


def build_cantilever(
    nx: int = 24, ny: int = 12, order: int = 1, lam: float = 1.0,
    mu: float = 1.0, simp_exp: float = 3.0,
):
    """Classic cantilever: clamped left edge, downward tip load (a compact
    topopt benchmark problem for SiMPLTopopt)."""
    from . import mesh as M

    m = M.make_cartesian_2d(nx, ny, sx=2.0, sy=1.0)
    dim = 2
    disp = FESpace(m, order, vdim=dim)
    design = FESpace(m, 0, L2)
    energy = ParametrizedElasticity(dim, design, lam, mu, simp_exp)
    form = NonlinearForm(disp)
    form.add_ad_integrator(energy, ADEval.GRAD | ADEval.VECTOR)
    ess = np.zeros(m.max_bdr_attribute())
    ess[3] = 1  # left edge (attr 4)
    form.set_essential_bc([ess])

    # downward point-ish load at the right-middle edge: use a narrow load
    def load(x):
        w = np.exp(-((x[0] - 2.0) ** 2 + (x[1] - 0.5) ** 2) / 0.01)
        return np.array([0.0, -w])

    b = LinearForm(disp, load).assemble()
    b[np.asarray(disp.essential_dofs(ess))] = 0.0
    return form, design, jnp.asarray(b), m, disp
