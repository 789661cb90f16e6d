"""Compile-only HBM accounting for the 4096^2 mixed phi-gradient.

AOT-compiles `_jit_phi_grad_and_fmix` (the MAP_joint phi-step gradient)
at 4096^2 P and prints the compiler's own memory analysis — no chip
execution, so knob variants iterate in ~1-2 min each. Knobs come from
the usual env vars, set by the caller per variant:

  CMBL_RADIX_B          force the factored radix (fwd AND bwd)
  CMBL_FACTORED_MAX     route auto -> fft above this N
  CMBL_GRAD_REMAT_MIN_N term-split threshold (999999 = off)

Usage: [ENV...] python scripts/probe_grad_mem4096.py [N] [prec]
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


def main(N=4096, prec="high"):
    from cmblensing_tpu.ops import deriv
    deriv.set_matmul_precision("f32")
    cpu = jax.devices("cpu")[0]
    cache = f"/tmp/ds{N}.pkl"
    t0 = time.time()
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            ds = pickle.load(fh)
    else:
        with jax.default_device(cpu):
            from cmblensing_tpu.models.dataset import load_sim
            out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32,
                           seed=0)
            ds = out["ds"]
        with open(cache, "wb") as fh:
            pickle.dump(jax.device_get(ds), fh)
    print(f"ds ready: {time.time()-t0:.0f}s", flush=True)

    from cmblensing_tpu.inference import maximization as mx
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.core.ops import Id

    theta = None
    dstheta = ds.at(theta).replace(G=Id)
    proj = ds.d.proj
    f = Field(jnp.zeros((2, N, N), jnp.float32), Basis("QU", "map"), proj)
    Cphi = mx._fid(dstheta.Cphi)
    phi = mx._zero_map_like(Cphi)

    knobs = {k: os.environ.get(k) for k in
             ("CMBL_RADIX_B", "CMBL_FACTORED_MAX", "CMBL_GRAD_REMAT_MIN_N")}
    print(f"variant: {knobs} prec={prec!r}", flush=True)

    pr = prec if prec != "None" else None
    term = os.environ.get("CMBL_PROBE_TERM")
    if term:
        # isolate ONE term's backward pass: grad of
        # Mixed(ds).logpdf_term(which=term) wrt phi_mix
        from functools import partial
        from cmblensing_tpu.models.dataset import Mixed, mix
        from cmblensing_tpu.core.field import fgrad

        @partial(jax.jit, static_argnums=(4, 5))
        def term_grad(dstheta, theta, f, phi, prec, which):
            with mx._pctx(prec):
                mixed = Mixed(dstheta)
                fm = mix(dstheta, f=f, phi=phi, theta=theta)
                f_mix = fm["f_mix"]
                phi_mix = fm["phi_mix"].to(
                    fm["phi_mix"].basis.with_space("map"))
                g = fgrad(lambda pm: jnp.sum(mixed.logpdf_term(
                    f_mix=f_mix, phi_mix=pm, theta=theta,
                    which=which)))(phi_mix)
                return g

        print(f"single-term probe: which={term!r}", flush=True)
        t0 = time.time()
        try:
            compiled = term_grad.lower(dstheta, theta, f, phi, pr,
                                       term).compile()
            dt = time.time() - t0
            ma = compiled.memory_analysis()
            gb = 1024 ** 3
            print(f"COMPILED in {dt:.0f}s", flush=True)
            if ma is not None:
                print(f"  temp: {ma.temp_size_in_bytes/gb:.2f} GB "
                      f"args: {ma.argument_size_in_bytes/gb:.2f} GB",
                      flush=True)
        except Exception as e:
            dt = time.time() - t0
            for line in str(e).splitlines():
                if "Ran out of memory" in line:
                    print(f"OOM after {dt:.0f}s: {line.strip()}", flush=True)
                    break
            else:
                print(f"FAILED after {dt:.0f}s: {str(e)[:400]}", flush=True)
        return

    t0 = time.time()
    try:
        lowered = mx._jit_phi_grad_and_fmix.lower(
            dstheta, theta, f, phi, prec if prec != "None" else None)
        compiled = lowered.compile()
        dt = time.time() - t0
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        print(f"COMPILED in {dt:.0f}s", flush=True)
        if ma is not None:
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "generated_code_size_in_bytes",
                      "alias_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    print(f"  {k}: {v/gb:.2f} GB", flush=True)
    except Exception as e:
        dt = time.time() - t0
        msg = str(e)
        for line in msg.splitlines():
            if ("Ran out of memory" in line or "hbm" in line.lower()
                    and "Used" in line):
                print(f"OOM after {dt:.0f}s: {line.strip()}", flush=True)
                break
        else:
            print(f"FAILED after {dt:.0f}s: {msg[:500]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         sys.argv[2] if len(sys.argv) > 2 else "high")
