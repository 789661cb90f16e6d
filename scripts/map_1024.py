"""North-star: full MAP_joint on 1024^2 polarization maps, on-chip."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

def main(N=1024, nsteps=6, precision="f32"):
    from cmblensing_tpu.ops import deriv
    deriv.set_matmul_precision(precision)
    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
        ds = out["ds"]
        phi_true = out["phi"].to(out["phi"].basis.with_space("map"))
        pt = np.asarray(phi_true.arr).ravel()
    print(f"load_sim({N}) on CPU: {time.time()-t0:.0f}s", flush=True)

    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference.maximization import MAP_joint
    from cmblensing_tpu.core import field as F
    dev = jax.devices()[0]
    ds_d, phi_d = device_put_safe((ds, phi_true), dev)

    t0 = time.time()
    res = MAP_joint(ds_d, nsteps=2, linesearch="grid",
                    conjgrad_kwargs=dict(tol=0.0, nsteps=15, fixed_iters=True))
    t_warm = time.time() - t0
    print(f"first 2 MAP steps (incl. compiles): {t_warm:.1f}s", flush=True)

    t0 = time.time()
    res = MAP_joint(ds_d, nsteps=nsteps, linesearch="grid",
                    history_keys=("logpdf", "alpha"),
                    conjgrad_kwargs=dict(tol=0.0, nsteps=15, fixed_iters=True))
    dt = time.time() - t0
    print("alphas:", [round(h["alpha"], 4) for h in res["history"]], flush=True)
    import jax.numpy as jnp
    pa = res["phi"].arr
    print("phi stats:", float(jnp.sum(jnp.abs(pa))), float(jnp.sum(jnp.isnan(pa))), flush=True)
    from cmblensing_tpu.utils.transfer import device_get_safe
    pm = np.asarray(device_get_safe(res["phi"].to(res["phi"].basis.with_space("map")).arr)).ravel()
    corr = float(pm @ pt / (np.linalg.norm(pm) * np.linalg.norm(pt)))
    lps = [h["logpdf"] for h in res["history"]]
    print(f"MAP_joint {N}^2 P: {nsteps} steps in {dt:.1f}s "
          f"({dt/nsteps:.2f}s/step incl. host orchestration)", flush=True)
    print(f"corr(phi_MAP, phi_true) = {corr:.3f}; logpdfs={np.round(lps,1)}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         precision=(sys.argv[2] if len(sys.argv) > 2 else "f32"))
