"""On-chip bandpower MUSE: infer a VECTOR of phi bandpower amplitudes
(one per |l| bin of a banded Cl_to_Cov Cphi) from a simulated dataset —
the reference's MuseInference headline use case
(ext/CMBLensingMuseInferenceExt.jl + proj_lambert.jl:374-411), here
first-party: banded ParamDependentOp covariance + flat-spec muse().

Usage: python scripts/muse_bandpower.py [N] [nbins] [nsims] [pol]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(N=128, nbins=3, nsims=8, pol="I", nsteps=4):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        from cmblensing_tpu.core.cov import Cl_to_Cov
        from cmblensing_tpu.utils.cls import camb
        out = load_sim(thetapix=3, Nside=N, pol=pol, T=np.float32, seed=0)
        ds, proj = out["ds"], out["proj"]
        # phi bandpower bins: percentile edges of the grid's nonzero
        # |l| distribution so every bin holds a comparable number of
        # modes at ANY N (fixed edges leave the lowest bin with only
        # the DC mode on small grids -> singular MUSE H); the last bin
        # is open-ended so every |l| is covered
        lm = np.asarray(proj.lmag).ravel()
        lm = lm[lm > 0]
        inner = np.percentile(lm, np.linspace(0, 100, nbins + 1)[1:-1])
        edges = np.concatenate([[0.0], inner, [1e9]])
        Cphi_b = Cl_to_Cov("I", proj, (camb()["total"]["pp"], edges,
                                       "Aphi_b"))
        ds = ds.replace(Cphi=Cphi_b)
        # data simulated at a tilted truth spectrum: per-bin amplitudes
        truth = np.linspace(1.5, 0.8, nbins)
        sim = ds.simulate(jax.random.PRNGKey(7), theta=dict(Aphi_b=truth))
        ds = ds.replace(d=sim["d"].to(sim["d"].basis.with_space("map")))
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference.muse import muse
    dev = jax.devices()[0]
    ds_d, = device_put_safe((ds,), dev)

    t0 = time.time()
    res = muse(ds_d, dict(Aphi_b=np.ones(nbins)), nsims=nsims,
               nsteps=nsteps, key=jax.random.PRNGKey(3), progress=True,
               MAP_kwargs=dict(nsteps=5,
                               conjgrad_kwargs=dict(tol=0.0, nsteps=20,
                                                    fixed_iters=True)))
    dt = time.time() - t0
    A = np.asarray(res["theta"]["Aphi_b"])
    Sigma = np.asarray(res["Sigma"])
    sig = np.sqrt(np.diag(Sigma))
    pulls = (A - truth) / sig
    chi2 = float((A - truth) @ np.linalg.solve(Sigma, A - truth))
    print(f"bandpower MUSE {N}^2 {pol}, {nbins} phi bins, nsims={nsims}, "
          f"{dt:.0f}s:", flush=True)
    for i, lab in enumerate(res["labels"]):
        print(f"  {lab}: {A[i]:.3f} +/- {sig[i]:.3f} "
              f"(truth {truth[i]:.2f}, pull {pulls[i]:+.2f} sigma)",
          flush=True)
    print(f"joint chi2(theta_hat - truth | Sigma) = {chi2:.2f} / "
          f"{nbins} dof", flush=True)
    assert np.all(np.abs(pulls) < 4.0), pulls


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:4]]
    pol = sys.argv[4] if len(sys.argv) > 4 else "I"
    main(*a, pol=pol) if a else main(pol=pol)
