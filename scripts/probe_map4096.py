"""Phase-by-phase HBM accounting for the 4096^2 MAP step.

Runs load_sim on CPU, ships the dataset to the TPU, then executes the
MAP_joint phases one at a time (f-step CG, phi-gradient, preconditioner
apply, line search) printing device memory_stats() between each, to
locate what pins HBM at 4096^2.
"""
import sys, time
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
          f"peak={s.get('peak_bytes_in_use', 0)/gb:.2f} GB "
          f"limit={s.get('bytes_limit', 0)/gb:.2f} GB", flush=True)


def main(N=4096):
    import os, pickle
    from cmblensing_tpu.ops import deriv
    deriv.set_matmul_precision("f32")
    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    cache = f"/tmp/ds{N}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            ds = pickle.load(fh)
        print(f"loaded cached ds from {cache}: {time.time()-t0:.0f}s",
              flush=True)
    else:
        with jax.default_device(cpu):
            from cmblensing_tpu.models.dataset import load_sim
            out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
            ds = out["ds"]
        print(f"load_sim({N}) on CPU: {time.time()-t0:.0f}s", flush=True)
        with open(cache, "wb") as fh:
            pickle.dump(jax.device_get(ds), fh)

    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference import maximization as mx
    dev = jax.devices()[0]
    mem(dev, "before device_put")
    ds_d = device_put_safe(ds, dev)
    jax.block_until_ready(jax.tree_util.tree_leaves(ds_d)[0])
    mem(dev, "after device_put(ds)")

    theta = None
    dstheta = ds_d.at(theta)
    from cmblensing_tpu.core.ops import Id
    dstheta = dstheta.replace(G=Id)
    Cphi = mx._fid(dstheta.Cphi)
    phi = mx._zero_map_like(Cphi)
    Hpre = (mx.hessian_phimix_preconditioner(dstheta)
            if dstheta.Nphi is not None else Cphi.pinv())
    Hpre_inv = Hpre.pinv()
    mem(dev, "after preconditioner build")

    cg = dict(tol=0.0, nsteps=15, fixed_iters=True)
    t0 = time.time()
    f, cg_info = mx.argmaxf_logpdf(dstheta, phi=phi, theta=theta,
                                   conjgrad_kwargs=cg)
    jax.block_until_ready(f.arr)
    print(f"f-step: {time.time()-t0:.1f}s", flush=True)
    mem(dev, "after f-step")

    t0 = time.time()
    f_mix, phi_mix, g = mx._jit_phi_grad_and_fmix(dstheta, theta, f, phi, "high")
    jax.block_until_ready(g.arr)
    print(f"phi-grad: {time.time()-t0:.1f}s", flush=True)
    mem(dev, "after phi-grad")

    t0 = time.time()
    dphi = Hpre_inv @ g
    jax.block_until_ready(dphi.arr)
    print(f"precond apply: {time.time()-t0:.1f}s", flush=True)
    mem(dev, "after precond apply")

    t0 = time.time()
    alpha, _ = mx._jit_grid_linesearch(
        dstheta, theta, f_mix, phi_mix, dphi,
        jnp.float32(2.0), 16, "high", mx._linesearch_chunk(phi_mix, 16))
    jax.block_until_ready(alpha)
    print(f"linesearch: {time.time()-t0:.1f}s alpha={alpha}", flush=True)
    mem(dev, "after linesearch")

    t0 = time.time()
    out2 = mx._jit_step_unmix_and_norm(dstheta, theta, f_mix, phi_mix, dphi,
                                       jnp.float32(alpha), "high")
    jax.block_until_ready(out2[2])
    print(f"unmix+norm: {time.time()-t0:.1f}s logpdf={float(out2[2]):.1f}",
          flush=True)
    mem(dev, "after unmix")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
