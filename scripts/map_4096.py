"""Flagship: full MAP_joint at 4096^2 polarization on ONE v5e chip.

The reference cannot run above ~1024^2 on GPU at all
(/root/reference/src/proj_lambert.jl:54-56 warns and CUFFT plans OOM).
Round 4 built the machinery (term-split phi-gradients under 16 GB HBM,
batched-block factored flows, <2 GB QE executables); this script
EXECUTES the MAP end to end and reports:
  - cold (incl. compile) and warm s/step
  - peak HBM from device memory_stats()
  - phi recovery: map-level corr AND bandpower-level cross-correlation
    rho_b = Cl^{phihat x phi} / sqrt(Cl^{phihat} Cl^{phi}) per ell bin,
    quantifying how much of a low map-corr is just noise-dominated
    small scales (the caveat the 2048^2 row asserted without numbers).

Usage: python scripts/map_4096.py [N] [nsteps] [precision] [resume]
(resume="resume" warm-starts f/phi from /tmp/map{N}_result.pkl, so a
run continues where the previous one stopped instead of repaying the
early steps)
"""
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


def mem(dev, tag):
    s = dev.memory_stats() or {}
    gb = 1024 ** 3
    print(f"[mem] {tag}: in_use={s.get('bytes_in_use', 0)/gb:.2f} GB "
          f"peak={s.get('peak_bytes_in_use', 0)/gb:.2f} GB", flush=True)
    return s.get("peak_bytes_in_use", 0) / gb


def bandpower_corr(phi_map, phi_true, ledges):
    """rho_b per bin from host-side cross/auto spectra."""
    from cmblensing_tpu.utils.spectra import get_Cl
    cx = get_Cl(phi_map, phi_true, ledges=ledges)
    c1 = get_Cl(phi_map, ledges=ledges)
    c2 = get_Cl(phi_true, ledges=ledges)
    with np.errstate(invalid="ignore", divide="ignore"):
        rho = cx.Cl / np.sqrt(c1.Cl * c2.Cl)
    return cx.ell, rho


def main(N=4096, nsteps=10, precision="f32", resume=False):
    from cmblensing_tpu.ops import deriv
    deriv.set_matmul_precision(precision)
    cpu = jax.devices("cpu")[0]

    t0 = time.time()
    cache = f"/tmp/map{N}_ds.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            ds, phi_true = pickle.load(fh)
        print(f"loaded cached ds+phi from {cache}: {time.time()-t0:.0f}s",
              flush=True)
    else:
        with jax.default_device(cpu):
            from cmblensing_tpu.models.dataset import load_sim
            out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
            ds = out["ds"]
            phi_true = out["phi"].to(out["phi"].basis.with_space("map"))
        print(f"load_sim({N}) on CPU: {time.time()-t0:.0f}s", flush=True)
        with open(cache, "wb") as fh:
            pickle.dump(jax.device_get((ds, phi_true)), fh)

    pt = np.asarray(jax.device_get(phi_true.arr)).ravel()

    from cmblensing_tpu.utils.transfer import device_put_safe, device_get_safe
    from cmblensing_tpu.inference.maximization import MAP_joint
    dev = jax.devices()[0]
    ds_d = device_put_safe(ds, dev)
    jax.block_until_ready(jax.tree_util.tree_leaves(ds_d.d.arr)[0])
    mem(dev, "after device_put(ds)")

    cg = dict(tol=0.0, nsteps=15, fixed_iters=True)

    fstart = phistart = None
    if resume:
        with open(f"/tmp/map{N}_result.pkl", "rb") as fh:
            prev = pickle.load(fh)
        fstart, phistart = device_put_safe((prev["f"], prev["phi"]), dev)
        print(f"resuming from saved iterate (/tmp/map{N}_result.pkl)",
              flush=True)

    t0 = time.time()
    res = MAP_joint(ds_d, nsteps=1, linesearch="grid", conjgrad_kwargs=cg,
                    fstart=fstart, phistart=phistart)
    t_cold = time.time() - t0
    print(f"cold: first MAP step incl. compiles: {t_cold:.1f}s", flush=True)
    peak_cold = mem(dev, "after cold step")

    t0 = time.time()
    res = MAP_joint(ds_d, nsteps=nsteps, linesearch="grid",
                    history_keys=("logpdf", "alpha", "gradnorm", "cg_iters"),
                    conjgrad_kwargs=cg, fstart=fstart, phistart=phistart)
    dt = time.time() - t0
    peak = mem(dev, f"after warm {nsteps} steps")
    alphas = [round(h["alpha"], 4) for h in res["history"]]
    lps = [h["logpdf"] for h in res["history"]]
    gns = [float(h["gradnorm"]) for h in res["history"]]
    print(f"alphas: {alphas}", flush=True)
    print(f"logpdfs: {np.round(lps, 1)}", flush=True)
    print(f"gradnorms: {[f'{g:.4g}' for g in gns]}", flush=True)
    print(f"MAP_joint {N}^2 P: {nsteps} steps in {dt:.1f}s "
          f"({dt/nsteps:.2f}s/step warm incl. host orchestration)", flush=True)

    # ---- is alpha=0 the optimum or a noise stall? probe the dlp curve
    # at the final iterate on a fine alpha grid: at a genuine optimum
    # every trial's cancellation-free Delta-logpdf is <= 0 within noise
    from cmblensing_tpu.inference.maximization import (
        _jit_phi_grad_and_fmix, hessian_phimix_preconditioner,
        _mixed_gaussian_covs, _mixed_gaussian_z)
    from cmblensing_tpu.core.field import dot as field_dot
    dstheta = ds_d.at({})
    from cmblensing_tpu.core.ops import Id
    dstheta = dstheta.replace(G=Id)
    f_mix, phi_mix, g = _jit_phi_grad_and_fmix(dstheta, {}, res["f"],
                                               res["phi"], precision)
    Hpre_inv = hessian_phimix_preconditioner(dstheta).pinv()
    dphi = Hpre_inv @ g

    @jax.jit
    def dlp_probe(dstheta, f_mix, phi_mix, dphi, alphas):
        # path-consistent scan with chunk=1 (the 4096^2 memory guard):
        # every alpha, including the alpha=0 whose z seeds the carry,
        # runs the identical scan-body program
        covs = _mixed_gaussian_covs(dstheta, {})

        def zs_at(a):
            return list(_mixed_gaussian_z(dstheta, {}, f_mix,
                                          phi_mix + a * dphi))

        z0_shape = jax.eval_shape(zs_at, alphas[0])
        z0_init = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), z0_shape)

        def body(z0, inp):
            i, a = inp
            zs = zs_at(a)
            z0 = jax.tree_util.tree_map(
                lambda c, n: jnp.where(i == 0, n, c), z0, zs)
            tot = 0.0
            for za, z0c, Sa in zip(zs, z0, covs):
                z0b = z0c.to(za.basis)
                dz = za - z0b
                s = za + z0b
                tot = tot - 0.5 * field_dot(dz, Sa.solve(s))
            return z0, tot

        _, dlps = jax.lax.scan(
            body, z0_init, (jnp.arange(alphas.shape[0]), alphas))
        return dlps

    probe_alphas = jnp.array([0.0, 1e-3, 3e-3, 0.01, 0.03, 0.1, 0.25],
                             dtype=jnp.float32)
    dlps = np.asarray(jax.device_get(
        dlp_probe(dstheta, f_mix, phi_mix, dphi, probe_alphas)))
    print("final-iterate dlp probe (alpha: dlp):", flush=True)
    for a, d in zip(np.asarray(probe_alphas), dlps):
        print(f"  {a:8.4f}: {d:+.6g}", flush=True)

    from cmblensing_tpu.utils.transfer import device_get_safe as _get
    with open(f"/tmp/map{N}_result.pkl", "wb") as fh:
        pickle.dump({"phi": _get(res["phi"]), "f": _get(res["f"]),
                     "history": res["history"], "dlp_probe":
                     (np.asarray(probe_alphas), dlps)}, fh)
    print(f"saved result to /tmp/map{N}_result.pkl", flush=True)

    phi_map = res["phi"].to(res["phi"].basis.with_space("map"))
    phi_map = device_get_safe(phi_map)
    pm = np.asarray(phi_map.arr).ravel()
    corr = float(pm @ pt / (np.linalg.norm(pm) * np.linalg.norm(pt)))
    print(f"map-level corr(phi_MAP, phi_true) = {corr:.3f}", flush=True)

    phi_true_h = device_get_safe(phi_true)
    ledges = np.array([2, 100, 200, 350, 500, 750, 1000, 1500, 2000,
                       3000, 4500, 6000])
    ell, rho = bandpower_corr(phi_map, phi_true_h, ledges)
    print("bandpower cross-correlation rho_b:", flush=True)
    for l, r in zip(ell, rho):
        print(f"  ell ~ {l:7.1f}: rho = {r:.3f}", flush=True)

    print(f"SUMMARY N={N} precision={precision} cold2={t_cold:.1f}s "
          f"warm={dt/nsteps:.2f}s/step peakHBM={max(peak, peak_cold):.2f}GB "
          f"corr={corr:.3f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10,
         sys.argv[3] if len(sys.argv) > 3 else "f32",
         len(sys.argv) > 4 and sys.argv[4] == "resume")
