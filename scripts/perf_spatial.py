"""Spatially-sharded LenseFlow / Wiener-filter benchmark.

Measures the sharded flow and the sharded WF CG step against the
single-device operators at a given size. On a real pod slice this
shows the memory-capacity win (maps that OOM one chip) and the ICI
cost of the pencil all_to_alls; on the virtual CPU mesh it is a
correctness/scaling smoke only (CPU all_to_all is memcpy, not ICI).

    N=2048 MESH=8 python scripts/perf_spatial.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

N = int(os.environ.get("N", "1024"))
P = int(os.environ.get("MESH", "0")) or len(jax.devices())

from cmblensing_tpu import (load_sim, spatial_mesh, shard_spatial,
                            ShardedLenseFlow, sharded_wiener_filter)

mesh = spatial_mesh(P)
print(f"mesh: {P} x {jax.devices()[0].platform}", flush=True)

with jax.default_device(jax.devices("cpu")[0]):
    out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
    fl = out["f"].to_lense()
    pm = out["phi"].to(out["phi"].basis.with_space("map"))

f_sh, p_sh = shard_spatial(fl, mesh), shard_spatial(pm, mesh)


def timeit(tag, fn, *args, R=8):
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jitted(*args))
    print(f"  [{tag}] compile {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [jitted(*args) for _ in range(R)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / R)
    print(f"  [{tag}] {min(ts)*1e3:9.2f} ms/call (pipelined x{R})",
          flush=True)


timeit("sharded forward flow",
       lambda p, f: (ShardedLenseFlow(p, mesh=mesh) @ f).arr, p_sh, f_sh)
timeit("sharded flow gradient",
       jax.grad(lambda p, f: jnp.sum(
           (ShardedLenseFlow(p, mesh=mesh) @ f).arr ** 2)), p_sh, f_sh)

t0 = time.perf_counter()
f_wf, info = sharded_wiener_filter(out["ds"], pm, mesh, nsteps=10, tol=0.0)
jax.block_until_ready(f_wf.arr)
print(f"  [sharded WF, 10 CG iters] {time.perf_counter()-t0:.1f}s "
      f"(incl. compile)", flush=True)
