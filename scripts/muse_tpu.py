"""On-chip MUSE: the mass-sim pipeline on the real device — whole
simulation ensemble as ONE batched MAP_joint per score evaluation,
recovering Aphi with an H/J-derived sigma."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(N=128, nsims=8, nsteps=3, truth=1.4, pol="I"):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=3, Nside=N, pol=pol, T=np.float32, seed=0)
        ds = out["ds"]
        # data simulated at the truth Aphi
        sim = ds.at(dict(Aphi=truth)).simulate(jax.random.PRNGKey(7),
                                               theta=dict(Aphi=truth))
        ds = ds.replace(d=sim["d"].to(sim["d"].basis.with_space("map")))
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference.muse import muse
    dev = jax.devices()[0]
    ds_d, = device_put_safe((ds,), dev)

    t0 = time.time()
    res = muse(ds_d, dict(Aphi=1.0), nsims=nsims, nsteps=nsteps,
               key=jax.random.PRNGKey(3), progress=True,
               MAP_kwargs=dict(nsteps=5,
                               conjgrad_kwargs=dict(tol=0.0, nsteps=20,
                                                    fixed_iters=True)))
    dt = time.time() - t0
    A = res["theta"]["Aphi"]
    sig = float(np.sqrt(res["Sigma"][0, 0]))
    print(f"MUSE {N}^2 {pol}, nsims={nsims}: Aphi = {A:.3f} +/- {sig:.3f} "
          f"(truth {truth}) in {dt:.0f}s", flush=True)
    pull = (A - truth) / sig
    print(f"pull = {pull:.2f} sigma", flush=True)


if __name__ == "__main__":
    main(N=int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         pol=(sys.argv[2] if len(sys.argv) > 2 else "I"))
