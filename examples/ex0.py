"""Example 0: AD function check, no mesh — reference ex0.cpp.

Prints the AD gradient/Hessian/Jacobian/vector-Hessian against hand-coded
closed forms and the max-norm errors (ex0.cpp:100-162).
"""

# Allow running uninstalled: `python examples/exN.py` from a source checkout.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from mfem_ad_tpu.ad import ADFunction, ADVectorFunction


class MyADFunction(ADFunction):
    def energy(self, x, p):
        return jnp.sin(x[0]) * jnp.exp(x[1]) + x[2] ** 3


class MyADVecFunction(ADVectorFunction):
    def function(self, x, p):
        return jnp.array([jnp.sin(x[0] * x[1]), jnp.cos(x[0] * x[1] * x[2])])


def main():
    x = np.array([0.5, 1.0, -1.0])
    f = MyADFunction(3)

    jac = np.asarray(f.gradient(x))
    jac_ref = np.array(
        [
            np.cos(x[0]) * np.exp(x[1]),
            np.sin(x[0]) * np.exp(x[1]),
            3.0 * x[2] ** 2,
        ]
    )
    hess = np.asarray(f.hessian(x))
    hess_ref = np.array(
        [
            [-np.sin(x[0]) * np.exp(x[1]), np.cos(x[0]) * np.exp(x[1]), 0.0],
            [np.cos(x[0]) * np.exp(x[1]), np.sin(x[0]) * np.exp(x[1]), 0.0],
            [0.0, 0.0, 6.0 * x[2]],
        ]
    )

    print("Value :", float(f(x)))
    print("Jacobian  :", jac)
    print("Reference :", jac_ref)
    print("Hessian :\n", hess)
    print("Reference :\n", hess_ref)
    print()
    print("Jacobian error:", np.linalg.norm(jac - jac_ref))
    print("Hessian error:", np.abs(hess - hess_ref).max())
    print("-------------------------")

    f2 = MyADVecFunction(3, 2)
    X, Y, Z = x
    jac2 = np.asarray(f2.gradient(x))
    jac2_ref = np.array(
        [
            [Y * np.cos(X * Y), X * np.cos(X * Y), 0.0],
            [
                -Y * Z * np.sin(X * Y * Z),
                -X * Z * np.sin(X * Y * Z),
                -X * Y * np.sin(X * Y * Z),
            ],
        ]
    )
    print("Jacobian2 :\n", jac2)
    print("Reference :\n", jac2_ref)
    print("Jacobian2 error:", np.abs(jac2 - jac2_ref).max())

    hess2 = np.asarray(f2.hessian(x))  # [m, n, n]
    H0 = np.array(
        [
            [-Y * Y * np.sin(X * Y), np.cos(X * Y) - X * Y * np.sin(X * Y), 0],
            [np.cos(X * Y) - X * Y * np.sin(X * Y), -X * X * np.sin(X * Y), 0],
            [0, 0, 0],
        ]
    )
    print("Hessian[0] error:", np.abs(hess2[0] - H0).max())


if __name__ == "__main__":
    main()
