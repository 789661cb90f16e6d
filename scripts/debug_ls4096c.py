"""Discriminate WHY the 4096^2 in-MAP grid line search returns alpha=0
while the strict-f32 scalar probe shows a clean positive dlp curve at
the same iterate (slope ~2.7e5/alpha).

Two candidate culprits at 4096^2:
  - matmul precision: MAP_joint(precision="auto") traces the line
    search at 'high' (3-pass bf16, ~2^-21/matmul) while the probe ran
    strict f32 (HIGHEST); the steep Cphi/Cf tails amplify z-plane
    rounding through Sigma^-1.
  - the 1-wide-vmap chunked scan body vs the probe's scalar scan body.

Runs _jit_grid_linesearch_dlps (the EXACT in-MAP program) on the saved
final iterate at both precisions and prints the 17 trial dlps next to
the probe's curve. Usage: python scripts/debug_ls4096c.py [N]
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
    ds_d, phi, f = device_put_safe((ds, res["phi"], res["f"]), dev)
    dstheta = ds_d.at({}).replace(G=Id)

    f_mix, phi_mix, g = _jit_phi_grad_and_fmix(dstheta, {}, f, phi, "f32")
    dphi = hessian_phimix_preconditioner(dstheta).pinv() @ g
    jax.block_until_ready(dphi.arr)

    amax = jnp.float32(0.5)   # what steps 2..10 of the run used
    ngrid = 16
    chunk = _linesearch_chunk(phi_mix, ngrid)
    print(f"chunk = {chunk}", flush=True)

    for prec in ("high", "f32"):
        t0 = time.time()
        alphas, dlps = _jit_grid_linesearch_dlps(
            dstheta, {}, f_mix, phi_mix, dphi, amax, ngrid, prec, chunk)
        alphas = np.asarray(jax.device_get(alphas))
        dlps = np.asarray(jax.device_get(dlps))
        print(f"[prec={prec}] ({time.time()-t0:.0f}s incl. compile)",
              flush=True)
        for a, d in zip(alphas, dlps):
            print(f"  alpha={a:8.5f}: dlp={d:+.6g}", flush=True)
        print(f"  argmax: alpha={alphas[np.argmax(dlps)]:.5f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
