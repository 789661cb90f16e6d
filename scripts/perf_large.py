"""Large-map backend comparison: factored vs matmul vs fft at 2048/4096
(pipelined slope; spin-2 apply + flow gradient pieces)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from cmblensing_tpu.ops import deriv
from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf

N = int(os.environ.get("N", "2048"))
modes = os.environ.get("MODES", "factored,matmul,fft").split(",")
proj = ProjLambert(N, N, 1.0)
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-8)
c = jnp.float32(1e-3)

def pipelined(step, x0, R1=2, R2=8):
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

for mode in modes:
    deriv.set_deriv_mode(mode)
    g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
    g = jax.block_until_ready(g)
    # g/h ride through the step state as jit ARGUMENTS: closed-over
    # device arrays embed as HLO constants, and at 4096^2 the 5 phi
    # planes (320 MB) blow the remote-compile request limit (HTTP 413).
    def flow(s):
        x, g, h = s
        V = lambda t, y: lf._velocity(t, y, g, h, proj)
        return (lf._rk4(V, x, 0.0, 1.0, 7) * c, g, h)
    print(f"[{mode}] N={N} forward flow: {pipelined(flow, (f, g, h)):9.2f} ms", flush=True)
    def bflow(s):
        x, g, h = s
        df0, dphi = lf._backward_flow_scan(x[:2], x[2:4], g, h, proj,
                                           1.0, 0.0, 7)
        return (x + c * jnp.concatenate([df0, dphi + dphi, df0], axis=0)[:4], g, h)
    st = jnp.concatenate([f, f], axis=0)
    print(f"[{mode}] N={N} backward flow: {pipelined(bflow, (st, g, h)):8.2f} ms", flush=True)
deriv.set_deriv_mode("auto")
