"""Chained-slope timing of the LenseFlow velocity's pieces at 1024^2."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from cmblensing_tpu.ops import deriv
from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf

N = int(os.environ.get("N", "1024"))
proj = ProjLambert(N, N, 2.0)
deriv.set_deriv_mode(os.environ.get("DMODE", "factored"))
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
g = jax.block_until_ready(g)

def chain(body, x0, K1=1, K2=33):
    def make(K):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, K, lambda i, x: body(x), x)
        return run
    r1, r2 = make(K1), make(K2)
    jax.block_until_ready(r1(x0)); jax.block_until_ready(r2(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(r1(x0)); t1 = time.perf_counter()
        jax.block_until_ready(r2(x0)); t2 = time.perf_counter()
        ts.append(((t2-t1)-(t1-t0))/(K2-K1))
    return min(ts)*1e3

c = jnp.float32(1e-3)

# full forward velocity
t_vel = chain(lambda x: lf._velocity(0.5, x, g, h, proj) * c, f)
print(f"velocity       : {t_vel:7.3f} ms")
# derivative only
t_grad = chain(lambda x: sum(lf._grad_f(x, proj)) * c, f)
print(f"grad_f only    : {t_grad:7.3f} ms")
# p-reconstruction only (elementwise from g,h)
def pbody(x):
    px, py = lf._p_t(0.5, g, h)
    return x + (px[..., None, :, :] + py[..., None, :, :]) * c * 0
t_p = chain(pbody, f)
print(f"p(t) only      : {t_p:7.3f} ms")
# backward velocity
st = (f, f, jnp.zeros((1, N, N), jnp.float32))
def bbody(s):
    d = lf._backward_velocity(0.5, s, g, h, proj)
    return tuple(x + c * y for x, y in zip(s, d))
t_b = chain(bbody, st)
print(f"backward vel   : {t_b:7.3f} ms")
