"""Benchmark harness. Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
plus a full reference-style table (test/runbenchmarks.jl:132-145) to
stderr. Runs on whatever jax.devices()[0] is (TPU under the driver).
"""
import json
import sys
import time

import numpy as np


def _time(fn, *args, warmup=2, reps=10):
    """Wall-time fn (which must return a real scalar) — the host float()
    pull guarantees device synchronization even on remote backends
    where block_until_ready is unreliable."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from cmblensing_tpu.models.dataset import load_sim, mix, Mixed
    from cmblensing_tpu.models.lenseflow import LenseFlow, _gradhess_phi
    from cmblensing_tpu.core.field import fgrad, Field, dot as fdot

    # reference timings (CPU, 256^2, f32; test/runbenchmarks.jl:133-144)
    REF = {
        ("I", "cache"): 25, ("I", "apply"): 13, ("I", "adjoint"): 13,
        ("I", "gradlense"): 85, ("I", "lnP"): 65, ("I", "gradlnP"): 240,
        ("P", "cache"): 25, ("P", "apply"): 30, ("P", "adjoint"): 30,
        ("P", "gradlense"): 140, ("P", "lnP"): 110, ("P", "gradlnP"): 380,
    }

    results = {}
    for pol in ["I", "P"]:
        # build the dataset eagerly on CPU (remote-tunnel eager dispatch
        # is slow), then ship the pytrees to the benchmark device; only
        # jitted code touches the accelerator
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            out = load_sim(thetapix=3, Nside=256, pol=pol, T=np.float32, seed=0)
            ds = out["ds"]
            f = out["f"].to(out["f"].basis.with_space("map"))
            phi = out["phi"].to(out["phi"].basis.with_space("map"))
            m = mix(ds, f=f, phi=phi)
            f_mix, phi_mix = m["f_mix"], m["phi_mix"].to(phi.basis)
        proj = out["proj"]
        dev = jax.devices()[0]
        from cmblensing_tpu.utils.transfer import device_put_safe
        ds, f, phi, f_mix, phi_mix = device_put_safe((ds, f, phi, f_mix, phi_mix), dev)

        def _scal(x):
            return jnp.sum(jnp.abs(x))

        cache = jax.jit(lambda p: _scal(_gradhess_phi(p.arr, proj)[1][0]))
        apply_ = jax.jit(lambda p, f: _scal((LenseFlow(p, 7) @ f).arr))
        adjoint = jax.jit(lambda p, f: _scal((LenseFlow(p, 7).H @ f).arr))
        gradlense = jax.jit(
            lambda p, f: _scal(fgrad(lambda p: jnp.sum(fdot(LenseFlow(p, 7) @ f,
                                                            LenseFlow(p, 7) @ f)) / 2)(p).arr))
        # pass ds as a jit argument (it's a pytree) so data/covariances
        # are not baked into the HLO as constants
        lnP = jax.jit(lambda ds, fm, pm: jnp.sum(Mixed(ds).logpdf(f_mix=fm, phi_mix=pm)))
        gradlnP = jax.jit(
            lambda ds, fm, pm: _scal(fgrad(
                lambda pm: jnp.sum(Mixed(ds).logpdf(f_mix=fm, phi_mix=pm)))(pm).arr))

        results[(pol, "cache")] = _time(cache, phi)
        results[(pol, "apply")] = _time(apply_, phi, f)
        results[(pol, "adjoint")] = _time(adjoint, phi, f)
        results[(pol, "gradlense")] = _time(gradlense, phi, f)
        results[(pol, "lnP")] = _time(lnP, ds, f_mix, phi_mix)
        results[(pol, "gradlnP")] = _time(gradlnP, ds, f_mix, phi_mix)

    print(f"{'benchmark':<16s} {'ours(ms)':>9s} {'refCPU(ms)':>11s} {'speedup':>8s}",
          file=sys.stderr)
    for k, v in results.items():
        ref = REF[k]
        print(f"{k[0]+'/'+k[1]:<16s} {v:9.2f} {ref:11.1f} {ref/v:8.1f}x", file=sys.stderr)

    # headline: spin-2 posterior gradient (the dominant op in MAP/HMC)
    v = results[("P", "gradlnP")]
    print(json.dumps({
        "metric": "spin2_gradlnP_256_ms",
        "value": round(v, 3),
        "unit": "ms",
        "vs_baseline": round(REF[("P", "gradlnP")] / v, 2),
    }))


if __name__ == "__main__":
    main()
