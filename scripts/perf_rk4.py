"""Locate the gap between velocity cost and whole-flow cost at 1024^2
(pipelined python-loop slope timing: one small jitted program)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from cmblensing_tpu.ops import deriv
from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf

N = 1024
proj = ProjLambert(N, N, 2.0)
deriv.set_deriv_mode(os.environ.get("DMODE", "factored"))
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
g = jax.block_until_ready(g)

def pipelined(step, x0, R1=3, R2=13):
    step = jax.jit(step)
    jax.block_until_ready(step(x0))
    def t(R):
        ts = []
        for _ in range(3):
            xx = x0
            t0 = time.perf_counter()
            for _ in range(R):
                xx = step(xx)
            jax.block_until_ready(xx)
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (t(R2) - t(R1)) / (R2 - R1) * 1e3

c = jnp.float32(1e-3)
V = lambda t, x: lf._velocity(t, x, g, h, proj)

def rk4_step(x):
    h_ = jnp.float32(1.0 / 7)
    k1 = V(0.0, x)
    k2 = V(0.5, x + (h_/2) * k1)
    k3 = V(0.5, x + (h_/2) * k2)
    k4 = V(1.0, x + h_ * k3)
    return (x + (h_/6) * (k1 + 2*(k2+k3) + k4)) * c
print(f"rk4 step (alone)      : {pipelined(rk4_step, f):7.3f} ms", flush=True)

def flow(x):
    return lf._rk4(V, x, 0.0, 1.0, 7) * c
print(f"7-step scan flow      : {pipelined(flow, f):7.3f} ms", flush=True)

def flow_unrolled(x):
    h_ = jnp.float32(1.0 / 7)
    for i in range(7):
        t = i * h_
        k1 = V(t, x)
        k2 = V(t + h_/2, x + (h_/2) * k1)
        k3 = V(t + h_/2, x + (h_/2) * k2)
        k4 = V(t + h_, x + h_ * k3)
        x = x + (h_/6) * (k1 + 2*(k2+k3) + k4)
    return x * c
print(f"7-step unrolled flow  : {pipelined(flow_unrolled, f):7.3f} ms", flush=True)

from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.basis import QU_MAP, MAP
from cmblensing_tpu.models.lenseflow import LenseFlow
phif = Field(phi, MAP, proj)
def apply(x):
    return (LenseFlow(phif, 7) @ Field(x, QU_MAP, proj)).arr * c
print(f"public L@f            : {pipelined(apply, f):7.3f} ms", flush=True)
