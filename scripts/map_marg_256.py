"""On-chip MAP_marg measurement (the one headline algorithm without a
BENCH row through round 4): marginal MAP of P(phi | d) at 256^2 P with
Nsims vmapped mean-field simulations per step
(inference/maximization.py::MAP_marg; reference src/maximization.jl:
247-343 pmaps the sims over workers — here they are ONE batched
CG/gradient program on the chip).

Reports s/step (cold and warm), the mean-field-corrected phi's
convergence (gradient-norm trajectory), and recovery vs both phi_true
and the MAP_joint phi on the SAME data.

Usage: python scripts/map_marg_256.py [N] [Nsims] [nsteps]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def main(N=256, Nsims=16, nsteps=10):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=3, Nside=N, pol="P", T=np.float32, seed=0)
        ds = out["ds"]
        ds = ds.replace(d=ds.d.to(ds.d.basis.with_space("map")))
        phi_true = out["phi"].to(out["phi"].basis.with_space("map"))
    from cmblensing_tpu.utils.transfer import device_put_safe, device_get_safe
    from cmblensing_tpu.inference.maximization import MAP_marg, MAP_joint
    dev = jax.devices()[0]
    ds_d, phi_t = device_put_safe((ds, phi_true), dev)
    pt = np.asarray(device_get_safe(phi_t.arr))

    cg = dict(tol=0.0, nsteps=25, fixed_iters=True)

    t0 = time.time()
    MAP_marg(ds_d, key=jax.random.PRNGKey(1), nsteps=2, Nsims=Nsims,
             conjgrad_kwargs=cg)
    t_cold = time.time() - t0
    print(f"cold 2 steps incl. compiles: {t_cold:.1f}s", flush=True)

    t0 = time.time()
    phi_m, hist = MAP_marg(ds_d, key=jax.random.PRNGKey(1), nsteps=nsteps,
                           Nsims=Nsims, conjgrad_kwargs=cg, progress=True)
    dt = time.time() - t0
    phi_marg = device_get_safe(phi_m.to(phi_m.basis.with_space("map")))
    gnorms = [h.get("gradnorm") for h in hist
              if h.get("gradnorm") is not None]
    print(f"MAP_marg {N}^2 P, Nsims={Nsims}: {nsteps} steps in {dt:.1f}s "
          f"({dt/nsteps:.2f}s/step warm)", flush=True)
    if gnorms:
        print(f"gradnorms: {np.round(gnorms, 2)}", flush=True)

    c_true = corr(phi_marg.arr, pt)
    print(f"corr(phi_marg, phi_true) = {c_true:.3f}", flush=True)

    # MAP_joint phi on the same data for comparison
    t0 = time.time()
    rj = MAP_joint(ds_d, nsteps=8, conjgrad_kwargs=dict(
        tol=0.0, nsteps=25, fixed_iters=True))
    tj = time.time() - t0
    phi_j = device_get_safe(rj["phi"].to(rj["phi"].basis.with_space("map")))
    print(f"MAP_joint 8 steps: {tj:.1f}s; "
          f"corr(phi_joint, phi_true) = {corr(phi_j.arr, pt):.3f}; "
          f"corr(phi_marg, phi_joint) = {corr(phi_marg.arr, phi_j.arr):.3f}",
          flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:4]]
    main(*a)
