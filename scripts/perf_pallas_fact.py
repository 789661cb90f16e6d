"""Whole-flow / uni Pallas kernels with factored in-kernel derivatives
at 1024^2 (pipelined slope)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf
from cmblensing_tpu.ops import pallas_lenseflow as plf

N = int(os.environ.get("N", "1024"))
proj = ProjLambert(N, N, 2.0)
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
g = jax.block_until_ready(g)
c = jnp.float32(1e-3)

def pipelined(step, x0, R1=3, R2=13):
    step = jax.jit(step)
    t0 = time.perf_counter()
    jax.block_until_ready(step(x0))
    print(f"  (compile {time.perf_counter()-t0:.0f}s)", flush=True)
    def t(R):
        ts = []
        for _ in range(3):
            xx = x0
            tt0 = time.perf_counter()
            for _ in range(R):
                xx = step(xx)
            jax.block_until_ready(xx)
            ts.append(time.perf_counter() - tt0)
        return min(ts)
    return (t(R2) - t(R1)) / (R2 - R1) * 1e3

which = os.environ.get("WHICH", "flow_fwd")
if which == "flow_fwd":
    step = lambda x: plf.pallas_flow_apply(x, g, h, 0.0, 1.0, 7, proj,
                                           kind="forward") * c
    print(f"whole-flow fwd factored: {pipelined(step, f):8.3f} ms", flush=True)
elif which == "flow_adj":
    step = lambda x: plf.pallas_flow_apply(x, g, h, 0.0, 1.0, 7, proj,
                                           kind="adjoint") * c
    print(f"whole-flow adj factored: {pipelined(step, f):8.3f} ms", flush=True)
elif which == "uni_bwd":
    dphi0 = jnp.zeros((1, N, N), jnp.float32)
    st = jnp.concatenate([f, f, dphi0], axis=0)
    def step(s):
        out = plf._run_flow(s, (g[0], g[1], h[0], h[1], h[2]), proj,
                            "backward", 7, 1.0, 0.0, "f32")
        return s + c * out
    print(f"uni bwd factored:        {pipelined(step, st):8.3f} ms", flush=True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
