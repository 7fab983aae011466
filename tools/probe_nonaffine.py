import os, sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
os.environ.setdefault("MFEM_AD_TPU_NO_X64", "1")
mode = sys.argv[1]  # generic | pullback
if mode == "generic":
    os.environ["MFEM_AD_TPU_PULLBACK"] = "0"
import jax, jax.numpy as jnp, numpy as np
from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.ad import NeoHookeanEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.integrator import ADBlockIntegrator

# perturbed (non-affine) quad mesh, ~256k elements
n = int(os.environ.get("NN", "512"))
m0 = M.make_cartesian_2d(n, n)
rng = np.random.default_rng(0)
v = m0.vertices.copy()
interior = ((v[:, 0] > 1e-12) & (v[:, 0] < 1 - 1e-12)
            & (v[:, 1] > 1e-12) & (v[:, 1] < 1 - 1e-12))
v[interior] += (0.15 / n) * rng.uniform(-1, 1, size=(interior.sum(), 2))
m = M.Mesh(geom=m0.geom, vertices=v, elements=m0.elements,
           attributes=m0.attributes, bdr_elements=m0.bdr_elements,
           bdr_attributes=m0.bdr_attributes, structured=None)
fes = FESpace(m, 1, vdim=2)
intg = ADBlockIntegrator(NeoHookeanEnergy(2, 1.0, 1.0), [fes],
                         [ADEval.GRAD | ADEval.VECTOR], dtype=jnp.float32)
print("pullback:", intg.pullback, flush=True)
t = intg.tables
ne = m.num_elements
u = jnp.asarray(0.1 / n * rng.standard_normal(fes.ndof), dtype=jnp.float32)

def diffrate(make, r0=4, r1=12):
    run0, run1 = make(r0), make(r1)
    float(run0()); float(run1())
    def timed(run):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(run()); ts.append(time.perf_counter()-t0)
        return min(ts)
    return max((timed(run1) - timed(run0)) / (r1 - r0), 1e-12)

def jac_make(reps):
    @jax.jit
    def run():
        def body(acc, c):
            A = intg.element_jacobians([u * c], tables=t)
            return acc + jnp.sum(A), None
        cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
        return acc
    return run

def res_make(reps):
    @jax.jit
    def run():
        def body(acc, c):
            (r,) = intg.residual([u * c], tables=t)
            return acc + jnp.sum(r), None
        cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
        return acc
    return run

tj = diffrate(jac_make); tr = diffrate(res_make)
print(f"{mode}: jac {ne/tj/1e6:7.2f} Melem/s | res {ne/tr/1e6:7.2f} Melem/s", flush=True)
