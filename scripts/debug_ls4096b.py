"""Print the RAW per-alpha dlps of the production line-search path
(lax.map chunk=1) vs direct scalar calls, from the cached state."""
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
    ds, _ = pickle.load(fh)
from cmblensing_tpu.utils.transfer import device_put_safe
dev = jax.devices()[0]
ds = device_put_safe(ds, dev)
dstheta = ds.at({})
from cmblensing_tpu.core.ops import Id
dstheta = dstheta.replace(G=Id)
with open(f"/tmp/ls{N}_state.pkl", "rb") as fh:
    f_mix, phi_mix, dphi = device_put_safe(pickle.load(fh), dev)

from cmblensing_tpu.inference.maximization import (
    _mixed_gaussian_residuals, _pctx)
from cmblensing_tpu.core.field import dot as field_dot


@jax.jit
def dlps_mapped(dstheta, f_mix, phi_mix, dphi):
    rdt = phi_mix.arr.real.dtype
    steps = (jnp.arange(1, 5, dtype=rdt) / 16) ** 1.5
    alphas = jnp.float32(2.0) * steps
    with _pctx(None):
        res0 = _mixed_gaussian_residuals(dstheta, {}, f_mix, phi_mix)

        def dlp_at(alpha):
            res_a = _mixed_gaussian_residuals(dstheta, {}, f_mix,
                                              phi_mix + alpha * dphi)
            total = 0.0
            for (za, Sa), (z0, S0) in zip(res_a, res0):
                dz = za - z0.to(za.basis)
                s = za + z0.to(za.basis)
                total = total - 0.5 * field_dot(dz, Sa.solve(s))
            return total

        return jax.lax.map(dlp_at, alphas, batch_size=1)


@jax.jit
def dlp_scalar(dstheta, f_mix, phi_mix, dphi, alpha):
    with _pctx(None):
        res0 = _mixed_gaussian_residuals(dstheta, {}, f_mix, phi_mix)
        res_a = _mixed_gaussian_residuals(dstheta, {}, f_mix,
                                          phi_mix + alpha * dphi)
        total = 0.0
        for (za, Sa), (z0, S0) in zip(res_a, res0):
            dz = za - z0.to(za.basis)
            s = za + z0.to(za.basis)
            total = total - 0.5 * field_dot(dz, Sa.solve(s))
        return total


t0 = time.time()
out = dlps_mapped(dstheta, f_mix, phi_mix, dphi)
print("mapped dlps:", np.asarray(out), f"({time.time()-t0:.1f}s)", flush=True)

for i, a in enumerate((np.arange(1, 5) / 16) ** 1.5 * 2.0):
    v = dlp_scalar(dstheta, f_mix, phi_mix, dphi, jnp.float32(a))
    print(f"scalar alpha={a:.5f}: {float(v):.6g}", flush=True)
