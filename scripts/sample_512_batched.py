"""BASELINE configs[3]: sample_joint HMC/Gibbs, batched over 32 sims
on 512^2 polarization maps.

The 32 sims ride the leading batch axis through ONE jitted Gibbs-pass
program (CG f-step, HMC phi-step, batched accept/reject) — the TPU
counterpart of the reference's per-sim @distributed loop
(src/sampling.jl:186-193).  On a pod slice the same axis shards over
the mesh via parallel/mesh.py::shard_batch unchanged.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(N=512, nsims=32, nsamps=10):
    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32,
                       Nbatch=nsims, seed=0)
    print(f"load_sim({N}^2 P, Nbatch={nsims}) on CPU: {time.time()-t0:.0f}s",
          flush=True)
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference.sampling import sample_joint
    dev = jax.devices()[0]
    ds, = device_put_safe((out["ds"],), dev)

    t0 = time.time()
    res = sample_joint(ds, nsamps_per_chain=nsamps, nchains=nsims,
                       key=jax.random.PRNGKey(1),
                       symp_kwargs=[dict(N=25, eps=0.003)],
                       nburnin_always_accept=3,
                       conjgrad_kwargs=dict(tol=0.0, nsteps=25,
                                            fixed_iters=True),
                       progress=True)
    dt = time.time() - t0
    lps = np.asarray(res["logpdf"][0])
    try:
        acc = np.asarray(res["accept"]).astype(float)
    except Exception:
        acc = np.array([np.nan])
    print(f"sample_joint {N}^2 P x{nsims} sims: {nsamps} Gibbs passes in "
          f"{dt:.1f}s ({dt/nsamps:.2f}s/pass incl. compile)", flush=True)
    # warm timing: one more short run reusing the compiled program
    t0 = time.time()
    res2 = sample_joint(ds, nsamps_per_chain=3, nchains=nsims,
                        key=jax.random.PRNGKey(2),
                        symp_kwargs=[dict(N=25, eps=0.003)],
                        nburnin_always_accept=1,
                        conjgrad_kwargs=dict(tol=0.0, nsteps=25,
                                             fixed_iters=True),
                        progress=False)
    dt2 = time.time() - t0
    print(f"warm: 3 passes in {dt2:.1f}s ({dt2/3:.2f}s/pass)", flush=True)
    print(f"logpdf finite: {np.isfinite(lps).all()}  "
          f"mean accept: {np.nanmean(acc):.2f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         int(sys.argv[2]) if len(sys.argv) > 2 else 32,
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
