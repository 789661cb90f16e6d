"""Compile-only HBM accounting for the 4096^2 phi-gradient program.

Lowers _jit_phi_grad_and_fmix (or single terms of it) for the TPU
backend WITHOUT executing, and prints XLA's memory analysis — the
compile itself is what rejects >HBM programs, so design iterations
don't need the dataset on device at all.

Usage: python scripts/probe_grad_mem.py [N] [variant...]
variants: full prior data plain
"""
import sys, time, os, pickle
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def report(tag, lowered):
    t0 = time.time()
    try:
        c = lowered.compile()
        ma = c.memory_analysis()
        gb = 1024 ** 3
        print(f"[{tag}] temp={ma.temp_size_in_bytes/gb:.2f} GB "
              f"args={ma.argument_size_in_bytes/gb:.2f} GB "
              f"out={ma.output_size_in_bytes/gb:.2f} GB "
              f"(compile {time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "hbm" in l.lower()][:2]
        print(f"[{tag}] COMPILE FAILED after {time.time()-t0:.0f}s: "
              f"{' | '.join(key) if key else msg[:300]}", flush=True)


def main(N=4096, variants=("full",)):
    from cmblensing_tpu.ops import deriv
    deriv.set_matmul_precision("f32")
    cache = f"/tmp/ds{N}.pkl"
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if os.path.exists(cache):
            with open(cache, "rb") as fh:
                ds = pickle.load(fh)
        else:
            from cmblensing_tpu.models.dataset import load_sim
            out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
            ds = jax.device_get(out["ds"])
            with open(cache, "wb") as fh:
                pickle.dump(ds, fh)
        from cmblensing_tpu.inference import maximization as mx
        from cmblensing_tpu.core.ops import Id
        from cmblensing_tpu.models.dataset import Mixed, mix
        from cmblensing_tpu.core.field import fgrad, zeros_like_field

        dstheta = ds.at(None).replace(G=Id)
        Cphi = mx._fid(dstheta.Cphi)
        phi = mx._zero_map_like(Cphi)
        f = zeros_like_field(mx._fid(dstheta.Cf).diag)
        f = f.to(f.basis.with_space("map"))

    # abstractify array leaves so lowering targets the default (TPU)
    # backend without shipping any data to the chip
    def absify(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") and hasattr(x, "dtype") else x, tree)

    dstheta, f, phi = absify(dstheta), absify(f), absify(phi)
    theta = None
    saved_min_n = mx._REMAT_MIN_N
    for v in variants:
        if v == "full":
            mx._REMAT_MIN_N = saved_min_n
            lw = mx._jit_phi_grad_and_fmix.lower(dstheta, theta, f, phi, "high")
        elif v == "plain":
            mx._REMAT_MIN_N = 999999
            lw = mx._jit_phi_grad_and_fmix.lower(dstheta, theta, f, phi, "high")
            mx._REMAT_MIN_N = saved_min_n
        elif v in ("prior", "data"):
            mixed = Mixed(dstheta)

            @jax.jit
            def single_term_grad(dstheta, f, phi, _w=v):
                fm = mix(dstheta, f=f, phi=phi, theta=theta)
                f_mix = fm["f_mix"]
                phi_mix = fm["phi_mix"].to(fm["phi_mix"].basis.with_space("map"))
                from cmblensing_tpu.models.dataset import Mixed as _M
                mx_ = _M(dstheta)
                return fgrad(lambda pm: jnp.sum(mx_.logpdf_term(
                    f_mix=f_mix, phi_mix=pm, theta=theta, which=_w)))(phi_mix)

            lw = single_term_grad.lower(dstheta, f, phi)
        else:
            print(f"unknown variant {v}")
            continue
        report(v, lw)


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    variants = sys.argv[2:] or ["data", "prior", "full"]
    main(N, variants)
