"""North-star probe: spin-2 gradlnP and LenseFlow apply at 1024^2,
comparing FFT vs matmul derivative backends on the TPU."""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def main(N=1024):
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
    from cmblensing_tpu.models.lenseflow import LenseFlow
    from cmblensing_tpu.ops import deriv
    dev = jax.devices()[0]
    ds, f, phi, f_mix, phi_mix = device_put_safe((ds, f, phi, f_mix, phi_mix), dev)
    B_f, B_phi = f.basis, phi.basis
    eps = np.float32(1e-20)

    def slope(go, *args, K1=1, K2=9, reps=4):
        def t(K):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(go(K, *args))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        t(K1); t(K2)
        return max((t(K2) - t(K1)) / (K2 - K1) * 1e3, 0.0)

    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)

        @functools.partial(jax.jit, static_argnums=0)
        def apply_loop(K, farr, parr):
            def body(i, farr):
                return (LenseFlow(Field(parr, B_phi, proj), 7) @ Field(farr, B_f, proj)).arr
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, farr)))

        @functools.partial(jax.jit, static_argnums=0)
        def gradlnP_loop(K, pm0, ds, f_mix):
            mixed = Mixed(ds)
            def body(i, pm):
                g = fgrad(lambda p: jnp.sum(mixed.logpdf(f_mix=f_mix, phi_mix=p)))(
                    Field(pm, B_phi, proj))
                return pm + eps * g.arr
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, pm0)))

        try:
            ta = slope(apply_loop, f.arr, phi.arr)
            print(f"{mode}: P/apply@{N}  {ta:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{mode}: apply FAIL {repr(e)[:90]}", flush=True)
        try:
            tg = slope(gradlnP_loop, phi_mix.arr, ds, f_mix)
            print(f"{mode}: P/gradlnP@{N} {tg:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{mode}: gradlnP FAIL {repr(e)[:90]}", flush=True)
    deriv.set_deriv_mode("auto")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
