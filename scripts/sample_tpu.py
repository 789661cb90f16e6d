"""On-chip Gibbs sampler smoke: sample_joint on the TPU with native
checkpointing — validates the full production sampling path (CG
f-step, HMC phi-step, mix/unmix, safe transfers, CRC chunk writer) on
the real device."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(N=256, nsamps=10, nchains=2):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=3, Nside=N, pol="P", T=np.float32, seed=0)
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference.sampling import sample_joint
    from cmblensing_tpu.inference.chains import load_chains
    dev = jax.devices()[0]
    ds, = device_put_safe((out["ds"],), dev)

    fn = "/tmp/chain_tpu"
    t0 = time.time()
    res = sample_joint(ds, nsamps_per_chain=nsamps, nchains=nchains,
                       key=jax.random.PRNGKey(1),
                       symp_kwargs=[dict(N=15, eps=0.01)],
                       nburnin_always_accept=3,
                       conjgrad_kwargs=dict(tol=0.0, nsteps=25,
                                            fixed_iters=True),
                       filename=fn, nfilewrite=4, progress=True)
    dt = time.time() - t0
    lps = np.asarray(res["logpdf"][0])
    print(f"sample_joint {N}^2 P x{nchains} chains: {nsamps} passes "
          f"in {dt:.1f}s ({dt/nsamps:.2f}s/pass incl. compiles)", flush=True)
    loaded = load_chains(fn)
    print(f"reloaded {len(loaded)} chains x {len(loaded[0])} samples; "
          f"logpdf[0] finite={np.isfinite(lps).all()}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
