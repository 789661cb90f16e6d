"""Round out the 4096^2 stall diagnosis: run3 (f32 line-search trials,
'high' phi-gradient) STILL stalls at alpha=0 while the same trials
along an f32 gradient rise monotonically (debug_ls4096c). Hypothesis:
at 4096^2 the 'high' (3-pass bf16) matmuls corrupt the GRADIENT
DIRECTION itself, not just the trial dlps.

Measures, on the saved stalled iterate:
  - cos(dphi_high, dphi_f32) and norm ratio
  - f32 trial dlps along dphi_high vs along dphi_f32

Usage: python scripts/debug_ls4096d.py [N]
"""
import sys, time, pickle
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(N=4096):
    from cmblensing_tpu.ops import deriv
    deriv.set_matmul_precision("f32")
    with open(f"/tmp/map{N}_ds.pkl", "rb") as fh:
        ds, _ = pickle.load(fh)
    with open(f"/tmp/map{N}_result.pkl", "rb") as fh:
        res = pickle.load(fh)

    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference.maximization import (
        _jit_phi_grad_and_fmix, hessian_phimix_preconditioner,
        _jit_grid_linesearch_dlps, _linesearch_chunk)
    from cmblensing_tpu.core.ops import Id
    dev = jax.devices()[0]
    t0 = time.time()
    ds_d, phi, f = device_put_safe((ds, res["phi"], res["f"]), dev)
    jax.block_until_ready(phi.arr)
    print(f"device_put: {time.time()-t0:.0f}s", flush=True)
    dstheta = ds_d.at({}).replace(G=Id)
    Hpre_inv = hessian_phimix_preconditioner(dstheta).pinv()

    dphis = {}
    for prec in ("high", "f32"):
        t0 = time.time()
        f_mix, phi_mix, g = _jit_phi_grad_and_fmix(dstheta, {}, f, phi, prec)
        dphis[prec] = Hpre_inv @ g
        jax.block_until_ready(dphis[prec].arr)
        print(f"gradient[{prec}]: {time.time()-t0:.0f}s", flush=True)

    @jax.jit
    def cosnorm(a, b):
        num = jnp.vdot(a.arr.ravel(), b.arr.ravel()).real
        na = jnp.linalg.norm(a.arr.ravel())
        nb = jnp.linalg.norm(b.arr.ravel())
        return num / (na * nb), na / nb

    c, r = jax.device_get(cosnorm(dphis["high"], dphis["f32"]))
    print(f"cos(dphi_high, dphi_f32) = {float(c):.6f}   "
          f"|dphi_high|/|dphi_f32| = {float(r):.4f}", flush=True)

    amax = jnp.float32(2.0)   # what the stalled run3 grid actually used
    ngrid = 16
    chunk = _linesearch_chunk(phi_mix, ngrid)
    for tag in ("high", "f32"):
        t0 = time.time()
        alphas, dlps = _jit_grid_linesearch_dlps(
            dstheta, {}, f_mix, phi_mix, dphis[tag], amax, ngrid,
            "f32", chunk)
        alphas = np.asarray(jax.device_get(alphas))
        dlps = np.asarray(jax.device_get(dlps))
        print(f"[f32 trials along dphi_{tag}] ({time.time()-t0:.0f}s)",
              flush=True)
        for a, d in zip(alphas, dlps):
            print(f"  alpha={a:8.5f}: dlp={d:+.6g}", flush=True)
        print(f"  argmax: alpha={alphas[np.argmax(dlps)]:.5f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
