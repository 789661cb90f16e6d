"""Measure the rewritten backward flow (U/S-hoisted, batched applies)
at N^2. Usage: python scripts/perf_bwd_new.py [N]"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf
from cmblensing_tpu.ops import deriv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
deriv.set_deriv_mode(os.environ.get("CMBL_DMODE", "auto"))
deriv.set_matmul_precision(os.environ.get("CMBL_PREC", "f32"))

proj = ProjLambert(N, N, 2.0)
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
df = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
g = jax.block_until_ready(g)
c = jnp.float32(1e-3)


import json
_CO = json.loads(os.environ.get("CMBL_COMPILER_OPTS", "null"))


def pipelined(step, x0, R1=3, R2=13):
    step = jax.jit(step, compiler_options=_CO) if _CO else jax.jit(step)
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


st0 = jnp.concatenate([f, df], axis=0)


def step(s):
    df0, dphi = lf._backward_flow_scan(s[:2], s[2:4], g, h, proj, 1.0, 0.0, 7)
    return s + c * jnp.concatenate([df0, dphi + dphi, df0], axis=0)[:4]


print(f"bwd new:  {pipelined(step, st0):8.2f} ms", flush=True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
