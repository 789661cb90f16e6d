"""Production-path 1024^2 measurements for BENCH.md: spin-2 apply,
adjoint, gradlnP via the public LenseFlow API, scan vs pallas backend,
at the given matmul precision. Usage:
    python scripts/perf_1024_final.py [N] [f32|high] [scan|pallas|both] [matmul|factored|fft|auto]
"""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(N=1024, prec="f32", which="both", dmode="matmul"):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim, mix, Mixed
        out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
        ds = out["ds"]
        # closures bake ds into jitted programs as constants; keep every
        # leaf real so lowering never needs a complex d2h on the tunnel
        ds = ds.replace(d=ds.d.to(ds.d.basis.with_space("map")))
        f = out["f"].to(out["f"].basis.with_space("map"))
        phi = out["phi"].to(out["phi"].basis.with_space("map"))
        m = mix(ds, f=f, phi=phi)
        f_mix = m["f_mix"].to(f.basis)
        phi_mix = m["phi_mix"].to(phi.basis)
    proj = out["proj"]
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.core.field import Field, fgrad
    from cmblensing_tpu.models.lenseflow import LenseFlow, lenseflow_backend_ctx
    from cmblensing_tpu.models.dataset import Mixed
    from cmblensing_tpu.ops import deriv
    deriv.set_deriv_mode(dmode)
    deriv.set_matmul_precision(prec)
    dev = jax.devices()[0]
    ds, f, phi, f_mix, phi_mix = device_put_safe((ds, f, phi, f_mix, phi_mix), dev)
    B_f, B_phi = f.basis, phi.basis

    def pipelined(make_step, x0, R1=3, R2=12):
        """Slope timing via async chaining (avoids giant fori_loop
        programs whose remote compiles take tens of minutes)."""
        step = jax.jit(make_step)
        x = step(x0)
        jax.block_until_ready(x)   # compile

        def t(R):
            ts = []
            for _ in range(3):
                xx = x0
                t0 = time.perf_counter()
                for _ in range(R):
                    xx = step(xx)
                jax.block_until_ready(xx)
                ts.append(time.perf_counter() - t0)
            return min(ts)
        t1 = t(R1)
        t2 = t(R2)
        return (t2 - t1) / (R2 - R1) * 1e3

    eps = np.float32(1e-20)
    mixed = Mixed(ds)

    backends = ["scan", "pallas"] if which == "both" else [which]
    for be in backends:
        with lenseflow_backend_ctx(be):
            def apply_step(farr):
                return (LenseFlow(Field(phi.arr, B_phi, proj), 7)
                        @ Field(farr, B_f, proj)).arr
            ta = pipelined(apply_step, f.arr)
            print(f"[{prec}/{be}/{dmode}] P/apply@{N}:   {ta:8.2f} ms", flush=True)

            def adj_step(farr):
                return (LenseFlow(Field(phi.arr, B_phi, proj), 7).H
                        @ Field(farr, B_f, proj)).arr
            tj = pipelined(adj_step, f.arr)
            print(f"[{prec}/{be}/{dmode}] P/adjoint@{N}: {tj:8.2f} ms", flush=True)

            def grad_step(pm):
                g = fgrad(lambda p: jnp.sum(mixed.logpdf(
                    f_mix=Field(f_mix.arr, B_f, proj), phi_mix=p)))(
                    Field(pm, B_phi, proj))
                return pm + eps * g.arr
            tg = pipelined(grad_step, phi_mix.arr)
            print(f"[{prec}/{be}/{dmode}] P/gradlnP@{N}: {tg:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         sys.argv[2] if len(sys.argv) > 2 else "f32",
         sys.argv[3] if len(sys.argv) > 3 else "both",
         sys.argv[4] if len(sys.argv) > 4 else "matmul")
