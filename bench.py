"""Benchmark harness. Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
plus a full reference-style table (test/runbenchmarks.jl:132-145) to
stderr.

Timing method: each op is repeated K times *inside one jit* via
lax.fori_loop with the output chained back into the input (so XLA can
neither hoist nor fold the body), and the per-op time is the slope
between K1 and K2 — this cancels host/dispatch latency, which on
remotely-attached TPUs can exceed the device time by orders of
magnitude.
"""
import json
import sys
import time
import functools

import numpy as np


K1, K2 = 4, 104


def _slope_time(make_loop, reps=5):
    import jax
    import jax.numpy as jnp
    f1 = make_loop(K1)
    f2 = make_loop(K2)
    out1 = f1()
    out2 = f2()
    float(jnp.sum(jnp.abs(out1[0] if isinstance(out1, tuple) else out1)))
    float(jnp.sum(jnp.abs(out2[0] if isinstance(out2, tuple) else out2)))

    def t(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn()
            float(jnp.sum(jnp.abs(o[0] if isinstance(o, tuple) else o)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(f2) - t(f1)) / (K2 - K1) * 1e3, 0.0)  # ms


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from cmblensing_tpu.models.dataset import load_sim, mix, Mixed
    from cmblensing_tpu.models.lenseflow import LenseFlow, _gradhess_phi
    from cmblensing_tpu.core.field import fgrad, Field, dot as fdot
    from cmblensing_tpu.utils.transfer import device_put_safe

    REF = {
        ("I", "cache"): 25, ("I", "apply"): 13, ("I", "adjoint"): 13,
        ("I", "gradlense"): 85, ("I", "lnP"): 65, ("I", "gradlnP"): 240,
        ("P", "cache"): 25, ("P", "apply"): 30, ("P", "adjoint"): 30,
        ("P", "gradlense"): 140, ("P", "lnP"): 110, ("P", "gradlnP"): 380,
    }

    results = {}
    for pol in ["I", "P"]:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            out = load_sim(thetapix=3, Nside=256, pol=pol, T=np.float32, seed=0)
            ds = out["ds"]
            f = out["f"].to(out["f"].basis.with_space("map"))
            phi = out["phi"].to(out["phi"].basis.with_space("map"))
            m = mix(ds, f=f, phi=phi)
            f_mix = m["f_mix"].to(f.basis)
            phi_mix = m["phi_mix"].to(phi.basis)
        proj = out["proj"]
        dev = jax.devices()[0]
        ds, f, phi, f_mix, phi_mix = device_put_safe((ds, f, phi, f_mix, phi_mix), dev)
        B_f, B_phi = f.basis, phi.basis
        eps = np.float32(1e-20)

        def loop(body, init, K):
            @jax.jit
            def go():
                return jax.lax.fori_loop(0, K, lambda i, s: body(s), init)
            return go

        # cache: gradhess(phi), chained by a negligible perturbation
        def cache_body(parr):
            g, h = _gradhess_phi(parr, proj)
            return parr + eps * h[0][..., None, :, :]

        # apply / adjoint: chain the lensed field
        def apply_body(farr):
            out = LenseFlow(Field(phi.arr, B_phi, proj), 7) @ Field(farr, B_f, proj)
            return out.arr

        def adjoint_body(farr):
            out = LenseFlow(Field(phi.arr, B_phi, proj), 7).H @ Field(farr, B_f, proj)
            return out.arr

        # gradlense: d/dphi |L(phi) f|^2 / 2
        def gradlense_body(parr):
            g = fgrad(lambda p: jnp.sum(fdot(LenseFlow(p, 7) @ f, LenseFlow(p, 7) @ f)) / 2)(
                Field(parr, B_phi, proj))
            return parr + eps * g.arr

        mixed = Mixed(ds)

        def lnP_body(state):
            pm, acc = state
            lp = jnp.sum(mixed.logpdf(f_mix=f_mix, phi_mix=Field(pm, B_phi, proj)))
            return (pm + eps * lp, acc + lp)

        def gradlnP_body(pm):
            g = fgrad(lambda p: jnp.sum(mixed.logpdf(f_mix=f_mix, phi_mix=p)))(
                Field(pm, B_phi, proj))
            return pm + eps * g.arr

        results[(pol, "cache")] = _slope_time(lambda K: loop(cache_body, phi.arr, K))
        results[(pol, "apply")] = _slope_time(lambda K: loop(apply_body, f.arr, K))
        results[(pol, "adjoint")] = _slope_time(lambda K: loop(adjoint_body, f.arr, K))
        results[(pol, "gradlense")] = _slope_time(lambda K: loop(gradlense_body, phi.arr, K))
        results[(pol, "lnP")] = _slope_time(
            lambda K: loop(lnP_body, (phi_mix.arr, jnp.float32(0.0)), K))
        results[(pol, "gradlnP")] = _slope_time(lambda K: loop(gradlnP_body, phi_mix.arr, K))

    print(f"{'benchmark':<16s} {'ours(ms)':>9s} {'refCPU(ms)':>11s} {'speedup':>8s}",
          file=sys.stderr)
    for k, v in results.items():
        ref = REF[k]
        spd = ref / v if v > 0 else float("inf")
        print(f"{k[0]+'/'+k[1]:<16s} {v:9.3f} {ref:11.1f} {spd:8.1f}x", file=sys.stderr)

    v = results[("P", "gradlnP")]
    print(json.dumps({
        "metric": "spin2_gradlnP_256_ms",
        "value": round(v, 4),
        "unit": "ms",
        "vs_baseline": round(REF[("P", "gradlnP")] / max(v, 1e-6), 2),
    }))


if __name__ == "__main__":
    main()
