"""mfem_ad_tpu — a TPU-native (JAX/XLA/Pallas) automatic-differentiation
finite-element framework.

Re-designed from scratch with the capabilities of the reference library
``dohyun-cse/mfem-ad`` (a C++17 library on top of MFEM; see
``/root/reference``).  The reference's one big idea — write a scalar energy
density at a quadrature point and get the element energy, residual (via
forward-mode dual-number AD), and Jacobian (via nested duals) for free —
maps one-to-one onto JAX: an energy is a plain Python function
``f(x, params) -> scalar`` and the residual/Jacobian come from
``jax.grad`` / ``jax.hessian`` vmapped over ``[n_elem, n_qp]`` batches.

Layer map (cf. reference SURVEY.md §1):

=========  ======================================  =======================
reference  this package                            notes
=========  ======================================  =======================
MFEM       ``mesh`` ``fespace`` ``quadrature``     arrays, not objects
           ``basis`` ``geometry``
ad_native  ``ad``                                  jax.grad/hessian
ad_intg    ``adeval`` ``integrator`` ``forms``     batched einsum assembly
pg/dof_pg  ``pg`` ``dof_pg``                       jit-compiled LVPP loop
mmto       ``mmto``                                completed (ref stubbed)
tools/log  ``utils``                               TableLogger, VTK, ckpt
MPI/hypre  ``parallel``                            shard_map + psum
—          ``ops``                                 Pallas fused kernels
=========  ======================================  =======================
"""

import os
import tempfile

# Finite elements need f64 for the reference's 1e-8..1e-10 tolerances
# (ex2.cpp:83, ex4.cpp:172).  Opt out with MFEM_AD_TPU_NO_X64=1 — the
# performance-critical kernels are dtype-generic and benched in f32.
if not os.environ.get("MFEM_AD_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 inputs, which injects ~1e-3 relative noise
# into residual evaluation and Krylov iterations — fatal for Newton
# convergence (measured: f32 elasticity diverges on a v5e at default
# precision, converges to the f32 floor at HIGHEST).  FEM needs true-f32
# contractions; override with MFEM_AD_TPU_MATMUL_PRECISION={default,high}.
# Platform override: some environments force-register an accelerator
# platform via sitecustomize and ignore JAX_PLATFORMS; this gives users
# a working escape hatch (e.g. MFEM_AD_TPU_PLATFORM=cpu to develop on
# the host while the chip is busy).
_plat = os.environ.get("MFEM_AD_TPU_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

_prec = os.environ.get("MFEM_AD_TPU_MATMUL_PRECISION", "highest")
if _prec != "default":
    import jax

    jax.config.update("jax_default_matmul_precision", _prec)

# Persistent compilation cache: the LVPP drivers compile dozens of chunk
# programs (cold ex4 spends most of its wall in XLA), and every program
# is re-usable across runs.  On by default everywhere (it was test-only
# in round 2); opt out with MFEM_AD_TPU_NO_COMPILE_CACHE=1 or override
# the directory with MFEM_AD_TPU_COMPILE_CACHE=<dir>.
def _host_fingerprint() -> str:
    """Digest of the host CPU feature set, for scoping the compile cache.

    XLA's persistent-cache key does NOT include the host CPU features, so
    a cache directory written on one machine can hand AOT-compiled
    XLA:CPU executables to a host lacking those ISA extensions (observed:
    "Target machine feature +prefer-no-scatter is not supported on the
    host machine ... could lead to execution errors such as SIGILL", and
    a failing 2-process worker, when /tmp survived a VM migration).
    """
    import hashlib
    import platform

    key = platform.machine()
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags alone are not enough: LLVM derives per-uarch
                # tuning features (e.g. +prefer-no-gather) from the CPU
                # MODEL, so two hosts with identical flag sets can still
                # reject each other's AOT executables — include the
                # family/model/stepping identity too (observed round 4)
                if line.startswith(
                    ("flags", "model", "cpu family", "stepping",
                     "vendor_id")
                ):
                    parts.append(line)
                if line.startswith("power management"):
                    break  # first core only — all cores identical
        if parts:
            key = "".join(sorted(set(parts)))
    except OSError:
        pass
    return hashlib.sha1(key.encode()).hexdigest()[:10]


if not os.environ.get("MFEM_AD_TPU_NO_COMPILE_CACHE"):
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        # per-user path: a world-shared /tmp dir breaks (and is a
        # squatting vector) for the second user on a shared host;
        # per-host-fingerprint so a /tmp that outlives a VM migration
        # cannot serve AOT executables built for a different CPU
        _uid = getattr(os, "getuid", lambda: 0)()
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "MFEM_AD_TPU_COMPILE_CACHE",
                os.path.join(
                    tempfile.gettempdir(),
                    f"mfem_ad_tpu_jax_cache_{_uid}_{_host_fingerprint()}",
                ),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from . import quadrature, basis, mesh, geometry, fespace  # noqa: E402
from .ad import (  # noqa: E402
    ADFunction,
    ADVectorFunction,
    MassEnergy,
    DiffusionEnergy,
    DiffEnergy,
    LinearElasticityEnergy,
    Lagrangian,
    ALFunctional,
    EmptyEnergy,
    admax,
    admin,
)
from .adeval import ADEval  # noqa: E402
from .coefficients import (  # noqa: E402
    Coefficient,
    ConstantCoefficient,
    FunctionCoefficient,
    GridFunctionCoefficient,
    GridFunctionValueCoefficient,
    MappedGridFunctionCoefficient,
    VectorGradientGridFunction,
    VectorNormCoefficient,
    BooleanCoefficient,
    DifferentiableCoefficient,
    QPContext,
    qp_context,
)
from .fespace import qspace_to_fespace  # noqa: E402
from .forms import NonlinearForm, BlockNonlinearForm, LinearForm  # noqa: E402
from .pg import (  # noqa: E402
    PGStepSizeRule,
    ADPGFunctional,
    ADLambdaPGFunctional,
    ShannonEntropy,
    FermiDiracEntropy,
    HellingerEntropy,
    SimplexEntropy,
    PGSolver,
)

__version__ = "0.1.0"
