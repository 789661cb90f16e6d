"""Isolate the 4096^2 line-search failure: prec='high' vs None, and
vmap vs lax.map chunking. Caches (f, f_mix, phi_mix, dphi) so variants
rerun without the 300 s f-step."""
import os
import sys
import time
import pickle
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 4096
with open(f"/tmp/map{N}_ds.pkl", "rb") as fh:
    ds, phi_true = pickle.load(fh)
from cmblensing_tpu.utils.transfer import device_put_safe, device_get_safe
dev = jax.devices()[0]
ds = device_put_safe(ds, dev)
dstheta = ds.at({})
from cmblensing_tpu.core.ops import Id
dstheta = dstheta.replace(G=Id)

from cmblensing_tpu.inference.maximization import (
    argmaxf_logpdf, hessian_phimix_preconditioner, _fid, _zero_map_like,
    _jit_phi_grad_and_fmix, _jit_grid_linesearch)

state_cache = f"/tmp/ls{N}_state.pkl"
if os.path.exists(state_cache):
    with open(state_cache, "rb") as fh:
        host = pickle.load(fh)
    f_mix, phi_mix, dphi = device_put_safe(host, dev)
    print("loaded cached line-search state", flush=True)
else:
    Cphi = _fid(dstheta.Cphi)
    phi = _zero_map_like(Cphi)
    cg = dict(tol=0.0, nsteps=15, fixed_iters=True)
    t0 = time.time()
    f, _ = argmaxf_logpdf(dstheta, phi=phi, theta={}, conjgrad_kwargs=cg)
    f_mix, phi_mix, g = _jit_phi_grad_and_fmix(dstheta, {}, f, phi, "high")
    Hpre_inv = hessian_phimix_preconditioner(dstheta).pinv()
    dphi = Hpre_inv @ g
    jax.block_until_ready(dphi.arr)
    print(f"state built: {time.time()-t0:.1f}s", flush=True)
    with open(state_cache, "wb") as fh:
        pickle.dump(device_get_safe((f_mix, phi_mix, dphi)), fh)

for prec, chunk in [(None, 1), ("high", 1), ("high", 2)]:
    t0 = time.time()
    try:
        alpha, dlp = _jit_grid_linesearch(dstheta, {}, f_mix, phi_mix, dphi,
                                          jnp.float32(2.0), 16, prec, chunk)
        print(f"prec={prec} chunk={chunk}: alpha={float(alpha):.4f} "
              f"dlp={float(dlp):.6g} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"prec={prec} chunk={chunk}: FAILED {type(e).__name__} {e}",
              flush=True)
