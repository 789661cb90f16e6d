"""Stage-by-stage finiteness probe for the 4096^2 MAP step.

The first full run (scripts/map_4096.py) produced alpha=0 at every step
(line-search self-guard), i.e. every trial Delta-logpdf was NaN or
negative. This isolates which stage goes non-finite: f-step CG, the
mixed phi-gradient, the preconditioned direction, or the line-search
trial evaluations.
"""
import sys
import time
import pickle
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def finite(tag, field):
    arrs = jax.tree_util.tree_leaves(field)
    bad = []
    for a in arrs:
        n = int(jnp.sum(~jnp.isfinite(a)))
        if n:
            bad.append((a.shape, n))
    print(f"[{tag}] finite={not bad}" + (f" bad={bad}" if bad else ""),
          flush=True)
    return not bad


def main(N=4096, prec="high"):
    with open(f"/tmp/map{N}_ds.pkl", "rb") as fh:
        ds, phi_true = pickle.load(fh)
    from cmblensing_tpu.utils.transfer import device_put_safe
    dev = jax.devices()[0]
    ds = device_put_safe(ds, dev)
    dstheta = ds.at({})
    from cmblensing_tpu.core.ops import Id
    dstheta = dstheta.replace(G=Id)

    from cmblensing_tpu.inference.maximization import (
        argmaxf_logpdf, hessian_phimix_preconditioner, _fid,
        _zero_map_like, _jit_phi_grad_and_fmix, _jit_grid_linesearch,
        _linesearch_chunk)

    Cphi = _fid(dstheta.Cphi)
    phi = _zero_map_like(Cphi)
    cg = dict(tol=0.0, nsteps=15, fixed_iters=True)

    t0 = time.time()
    f, cg_info = argmaxf_logpdf(dstheta, phi=phi, theta={}, conjgrad_kwargs=cg)
    jax.block_until_ready(f.arr)
    print(f"f-step: {time.time()-t0:.1f}s", flush=True)
    finite("f", f.arr)

    t0 = time.time()
    f_mix, phi_mix, g = _jit_phi_grad_and_fmix(dstheta, {}, f, phi, prec)
    jax.block_until_ready(g.arr)
    print(f"phi grad: {time.time()-t0:.1f}s", flush=True)
    finite("f_mix", f_mix.arr)
    finite("phi_mix", phi_mix.arr)
    ok_g = finite("g", g.arr)
    print("  |g| =", float(jnp.linalg.norm(g.arr)), flush=True)

    Hpre = hessian_phimix_preconditioner(dstheta) if dstheta.Nphi is not None else Cphi.pinv()
    Hpre_inv = Hpre.pinv()
    finite("Hpre_inv diag", Hpre_inv.diag.arr)
    dphi = Hpre_inv @ g
    ok_d = finite("dphi", dphi.arr)
    print("  |dphi| =", float(jnp.linalg.norm(dphi.arr)), flush=True)

    t0 = time.time()
    chunk = _linesearch_chunk(phi_mix, 16)
    print("linesearch chunk =", chunk, flush=True)
    alpha, dlp = _jit_grid_linesearch(dstheta, {}, f_mix, phi_mix, dphi,
                                      jnp.float32(2.0), 16, prec, chunk)
    print(f"linesearch: {time.time()-t0:.1f}s alpha={float(alpha)} "
          f"best dlp={float(dlp)}", flush=True)

    # manual trial evaluations at a few alphas to see the dlp curve
    from cmblensing_tpu.inference.maximization import _mixed_gaussian_residuals
    from cmblensing_tpu.core.field import dot as field_dot

    @jax.jit
    def dlp_at(dstheta, f_mix, phi_mix, dphi, alpha):
        res0 = _mixed_gaussian_residuals(dstheta, {}, f_mix, phi_mix)
        res_a = _mixed_gaussian_residuals(dstheta, {}, f_mix,
                                          phi_mix + alpha * dphi)
        total = 0.0
        parts = []
        for (za, Sa), (z0, S0) in zip(res_a, res0):
            dz = za - z0.to(za.basis)
            s = za + z0.to(za.basis)
            p = -0.5 * field_dot(dz, Sa.solve(s))
            parts.append(p)
            total = total + p
        return total, parts

    for a in [1e-5, 1e-4, 1e-3, 0.03, 0.25, 1.0]:
        tot, parts = dlp_at(dstheta, f_mix, phi_mix, dphi, jnp.float32(a))
        print(f"  alpha={a}: dlp={float(tot):.6g} parts="
              f"{[float(p) for p in parts]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         sys.argv[2] if len(sys.argv) > 2 else "high")
