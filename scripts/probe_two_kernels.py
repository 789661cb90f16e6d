"""Does the remote compile helper still abort on TWO distinct Mosaic
kernels at 1024^2? Probe: one jit containing an fa-kernel forward
apply AND a uni-kernel backward velocity."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CMBL_FORCE_UNI"] = "1"
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

fmats, _ = plf._fmats_for(proj, np.float32)
fkey = (proj.Nx, proj.Ny, float(proj.deltax), "float32")
dmats = fmats if fmats is not None else plf._mats_for(proj, np.float32)


@jax.jit
def prog(x):
    # kernel 1: fa forward apply
    y = plf._fa_call(x, (*g, *h), dmats, "forward", 7, 0.0, 1.0, "f32",
                     False, fkey)
    # kernel 2: uni backward velocity steps
    st = jnp.concatenate([y, x, jnp.zeros((1, N, N), jnp.float32)], axis=0)
    out = plf._uni_call(st, (g[0], g[1], h[0], h[1], h[2]), dmats,
                        "backward", 2, 1.0, 0.0, "f32", False, fkey)
    return y.sum() + out.sum()


t0 = time.perf_counter()
v = jax.block_until_ready(prog(f))
print(f"TWO KERNELS COMPILED OK in {time.perf_counter()-t0:.0f}s, v={v}",
      flush=True)
