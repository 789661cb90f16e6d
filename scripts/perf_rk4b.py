"""RK4 structure variants at 1024^2: stage-input barriers + unroll."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from cmblensing_tpu.ops import deriv
from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf

N = 1024
proj = ProjLambert(N, N, 2.0)
deriv.set_deriv_mode("factored")
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
g = jax.block_until_ready(g)
c = jnp.float32(1e-3)
V = lambda t, x: lf._velocity(t, x, g, h, proj)
OB = jax.lax.optimization_barrier

def pipelined(step, x0, R1=3, R2=13):
    step = jax.jit(step)
    t0 = time.perf_counter()
    jax.block_until_ready(step(x0))
    print(f"  (compile {time.perf_counter()-t0:.0f}s)", flush=True)
    def t(R):
        ts = []
        for _ in range(3):
            xx = x0
            tt = time.perf_counter()
            for _ in range(R):
                xx = step(xx)
            jax.block_until_ready(xx)
            ts.append(time.perf_counter() - tt)
        return min(ts)
    return (t(R2) - t(R1)) / (R2 - R1) * 1e3

def flow_barrier(x, unroll=1):
    h_ = jnp.float32(1.0 / 7)
    def step(x, i):
        t = i * h_
        k1 = V(t, OB(x))
        k2 = V(t + h_/2, OB(x + (h_/2) * k1))
        k3 = V(t + h_/2, OB(x + (h_/2) * k2))
        k4 = V(t + h_, OB(x + h_ * k3))
        return x + (h_/6) * (k1 + 2*(k2+k3) + k4), None
    x, _ = jax.lax.scan(step, x, jnp.arange(7, dtype=jnp.float32), unroll=unroll)
    return x * c

def flow_plain_unroll(x):
    def step(x, i):
        h_ = jnp.float32(1.0 / 7)
        t = i * h_
        k1 = V(t, x)
        k2 = V(t + h_/2, x + (h_/2) * k1)
        k3 = V(t + h_/2, x + (h_/2) * k2)
        k4 = V(t + h_, x + h_ * k3)
        return x + (h_/6) * (k1 + 2*(k2+k3) + k4), None
    x, _ = jax.lax.scan(step, x, jnp.arange(7, dtype=jnp.float32), unroll=7)
    return x * c

print(f"barrier scan   : {pipelined(lambda x: flow_barrier(x, 1), f):8.3f} ms", flush=True)
print(f"barrier unroll7: {pipelined(lambda x: flow_barrier(x, 7), f):8.3f} ms", flush=True)
print(f"plain unroll7  : {pipelined(flow_plain_unroll, f):8.3f} ms", flush=True)
