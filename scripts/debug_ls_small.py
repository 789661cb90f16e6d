"""CPU repro hunt: does the production grid line search (lax.map /
vmap trial path) disagree with scalar trial evaluation at small N,
with the batched factored form forced (the 4096^2 configuration)?"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cmblensing_tpu.models.dataset import load_sim
from cmblensing_tpu.inference.maximization import (
    argmaxf_logpdf, hessian_phimix_preconditioner, _fid, _zero_map_like,
    _jit_phi_grad_and_fmix, _jit_grid_linesearch, _jit_mixed_logpdf_alpha)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
ds = out["ds"]
dstheta = ds.at({})
from cmblensing_tpu.core.ops import Id
dstheta = dstheta.replace(G=Id)

Cphi = _fid(dstheta.Cphi)
phi = _zero_map_like(Cphi)
f, _ = argmaxf_logpdf(dstheta, phi=phi, theta={}, conjgrad_kwargs=dict(tol=1e-3, nsteps=100))
f_mix, phi_mix, g = _jit_phi_grad_and_fmix(dstheta, {}, f, phi, None)
Hpre_inv = hessian_phimix_preconditioner(dstheta).pinv()
dphi = Hpre_inv @ g

for chunk in (16, 1):
    alpha, dlp = _jit_grid_linesearch(dstheta, {}, f_mix, phi_mix, dphi,
                                      jnp.float32(2.0), 16, None, chunk)
    print(f"chunk={chunk}: alpha={float(alpha):.4f} dlp={float(dlp):.6g}",
          flush=True)

# scalar reference: full mixed logpdf difference at the same alphas
lp0 = _jit_mixed_logpdf_alpha(dstheta, {}, f_mix, phi_mix, dphi,
                              jnp.float32(0.0), None)
for a in [(1 / 16) ** 1.5 * 2, 0.5, 2.0]:
    lpa = _jit_mixed_logpdf_alpha(dstheta, {}, f_mix, phi_mix, dphi,
                                  jnp.float32(a), None)
    print(f"scalar full-logpdf dlp at alpha={a:.4f}: {float(lpa - lp0):.6g}",
          flush=True)
