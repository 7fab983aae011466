import os, sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
os.environ.setdefault("MFEM_AD_TPU_NO_X64", "1")
import jax, jax.numpy as jnp, numpy as np
from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.integrator import _edof_inverse

m = M.spatial_sort(M.read_mfem_mesh("/root/reference/data/sloped_rectangle.mesh").uniform_refine(8))
fes = FESpace(m, 1, vdim=2)
edof = np.asarray(fes.edof, dtype=np.int64)
ne, nd = edof.shape
nds = fes.ndof_scalar
vdim = 2
inv = np.asarray(_edof_inverse(edof.astype(np.int32), nds))  # [nds, V]
V = inv.shape[1]
rng = np.random.default_rng(0)
re = jnp.asarray(rng.standard_normal((ne*nd, vdim)), dtype=jnp.float32)
pad = jnp.concatenate([re, jnp.zeros((1, vdim), re.dtype)], axis=0)
invj = jnp.asarray(inv)
# column-sorted variant: sort each column independently + remember perm
colperm = np.argsort(inv, axis=0, kind="stable")
inv_cs = np.take_along_axis(inv, colperm, axis=0)
unperm = np.empty_like(colperm)
for v in range(V):
    unperm[colperm[:, v], v] = np.arange(nds)
inv_cs_j = jnp.asarray(inv_cs); unperm_j = jnp.asarray(unperm)

def diffrate(make, r0=4, r1=16):
    run0, run1 = make(r0), make(r1)
    float(run0()); float(run1())
    def timed(run):
        ts=[]
        for _ in range(5):
            t0=time.perf_counter(); float(run()); ts.append(time.perf_counter()-t0)
        return min(ts)
    return max((timed(run1)-timed(run0))/(r1-r0), 1e-12)

def bench(name, f):
    def make(reps):
        @jax.jit
        def run():
            def body(acc, c):
                r = f(pad * c)
                return acc + jnp.sum(r), None
            cs = 1.0 + jnp.arange(reps, dtype=jnp.float32)*1e-6
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return acc
        return run
    t_ = diffrate(make)
    print(f"{name:28s}: {t_*1e3:7.2f} ms", flush=True)
    return t_

bench("valence gather (current)", lambda p: p[invj].sum(axis=1))
bench("V single gathers", lambda p: sum(p[invj[:, v]] for v in range(V)))
def colsorted(p):
    acc = None
    for v in range(V):
        g = p[inv_cs_j[:, v]][unperm_j[:, v]]
        acc = g if acc is None else acc + g
    return acc
bench("V col-sorted double gather", colsorted)
# scatter-add baseline
idx = jnp.asarray(edof)
re3 = re.reshape(ne, nd, vdim)
def scat(p):
    out = jnp.zeros((nds, vdim), p.dtype)
    return out.at[idx].add(p[:-1].reshape(ne, nd, vdim))
bench("scatter-add .at[].add", scat)
# transposed flat gather: gather scalars from [vdim*(ne*nd)] flattened
padT = jnp.concatenate([re.T.reshape(-1), jnp.zeros(2, re.dtype)])
invT0 = jnp.asarray(np.where(inv < ne*nd, inv, ne*nd*vdim))
def flatT(p):
    pT = jnp.concatenate([p[:-1].T.reshape(-1), jnp.zeros(2, p.dtype)])
    outs = []
    for c in range(vdim):
        outs.append(pT[jnp.where(invT0 < ne*nd, invT0 + c*ne*nd, ne*nd*vdim)].sum(axis=1))
    return jnp.stack(outs, axis=1)
bench("transposed scalar gather", flatT)
