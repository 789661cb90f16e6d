"""North-star probe: 1024^2 spin-2 apply / gradlnP with the pallas
LenseFlow backend vs the scan backend, on the attached TPU."""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def main(N=1024, prec="f32"):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim, mix, Mixed
        out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
        ds = out["ds"]
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
    deriv.set_deriv_mode("matmul")
    deriv.set_matmul_precision(prec)
    dev = jax.devices()[0]
    ds, f, phi, f_mix, phi_mix = device_put_safe((ds, f, phi, f_mix, phi_mix), dev)
    B_f, B_phi = f.basis, phi.basis
    eps = np.float32(1e-20)

    jit_k = functools.partial(jax.jit, static_argnums=(0, 1))

    @jit_k
    def apply_loop(be, K, farr, parr):
        with lenseflow_backend_ctx(be):
            def body(i, farr):
                return (LenseFlow(Field(parr, B_phi, proj), 7) @ Field(farr, B_f, proj)).arr
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, farr)))

    @jit_k
    def gradlnP_loop(be, K, pm0, ds, fm):
        with lenseflow_backend_ctx(be):
            mixed = Mixed(ds)
            def body(i, pm):
                g = fgrad(lambda p: jnp.sum(mixed.logpdf(f_mix=Field(fm, B_f, proj),
                                                         phi_mix=p)))(
                    Field(pm, B_phi, proj))
                return pm + eps * g.arr
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, pm0)))

    def slope(go, be, *args, K2=9, reps=4):
        def t(K):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(go(be, K, *args))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        t(1); t(K2)
        return max((t(K2) - t(1)) / (K2 - 1) * 1e3, 0.0)

    for be in ["scan", "pallas"]:
        print(f"[{prec}] apply   {be:<7s}: {slope(apply_loop, be, f.arr, phi.arr):8.2f} ms", flush=True)
    for be in ["scan", "pallas"]:
        print(f"[{prec}] gradlnP {be:<7s}: {slope(gradlnP_loop, be, phi_mix.arr, ds, f_mix.arr):8.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         sys.argv[2] if len(sys.argv) > 2 else "f32")
