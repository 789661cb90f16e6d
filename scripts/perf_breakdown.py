"""Fine-grained 1024^2 timing breakdown on the attached TPU: forward
apply, adjoint apply, pure backward flow (custom_vjp bwd), gradlense
(fwd+bwd), mixed logpdf, gradlnP — at each matmul precision — to see
where the north-star gap lives before/after the Pallas kernels."""
import sys, time, functools, os
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
    from cmblensing_tpu.core.field import Field, fgrad, dot as fdot
    from cmblensing_tpu.models.lenseflow import (
        LenseFlow, _lenseflow_bwd, _gradhess_phi)
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

    jit_k = functools.partial(jax.jit, static_argnums=0)
    deriv.set_deriv_mode("matmul")

    @jit_k
    def apply_loop(K, farr, parr):
        def body(i, farr):
            return (LenseFlow(Field(parr, B_phi, proj), 7) @ Field(farr, B_f, proj)).arr
        return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, farr)))

    @jit_k
    def adjoint_loop(K, farr, parr):
        def body(i, farr):
            return (LenseFlow(Field(parr, B_phi, proj), 7).H @ Field(farr, B_f, proj)).arr
        return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, farr)))

    @jit_k
    def bwdonly_loop(K, farr, parr):
        # pure custom_vjp backward integration (residual = (phi, f1))
        def body(i, farr):
            dphi, df0 = _lenseflow_bwd(0.0, 1.0, 7, proj, "scan", None, (parr, farr), farr)
            return farr + eps * df0
        return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, farr)))

    @jit_k
    def gradlense_loop(K, parr, farr):
        def body(i, parr):
            fF = Field(farr, B_f, proj)
            g = fgrad(lambda p: jnp.sum(fdot(LenseFlow(p, 7) @ fF,
                                             LenseFlow(p, 7) @ fF)) / 2)(
                Field(parr, B_phi, proj))
            return parr + eps * g.arr
        return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, parr)))

    @jit_k
    def lnP_loop(K, pm0, ds, fm):
        from cmblensing_tpu.models.dataset import Mixed
        mixed = Mixed(ds)
        def body(i, state):
            pm, acc = state
            lp = jnp.sum(mixed.logpdf(f_mix=fm, phi_mix=Field(pm, B_phi, proj)))
            return (pm + eps * lp, acc + lp)
        o = jax.lax.fori_loop(0, K, body, (pm0, jnp.float32(0.0)))
        return jnp.sum(jnp.abs(o[0])) + o[1]

    @jit_k
    def gradlnP_loop(K, pm0, ds, fm):
        from cmblensing_tpu.models.dataset import Mixed
        mixed = Mixed(ds)
        def body(i, pm):
            g = fgrad(lambda p: jnp.sum(mixed.logpdf(f_mix=fm, phi_mix=p)))(
                Field(pm, B_phi, proj))
            return pm + eps * g.arr
        return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, pm0)))

    @jit_k
    def gradhess_loop(K, parr):
        def body(i, parr):
            g, h = _gradhess_phi(parr, proj)
            return parr + eps * h[0][..., None, :, :]
        return jnp.sum(jnp.abs(jax.lax.fori_loop(0, K, body, parr)))

    for prec in (sys.argv[2:] or ["f32", "high"]):
        deriv.set_matmul_precision(prec)
        print(f"=== precision {prec} (N={N}) ===", flush=True)
        for name, fn, args in [
            ("apply", apply_loop, (f.arr, phi.arr)),
            ("adjoint", adjoint_loop, (f.arr, phi.arr)),
            ("bwdflow", bwdonly_loop, (f.arr, phi.arr)),
            ("gradlense", gradlense_loop, (phi.arr, f.arr)),
            ("lnP", lnP_loop, (phi_mix.arr, ds, f_mix.arr)),
            ("gradlnP", gradlnP_loop, (phi_mix.arr, ds, f_mix.arr)),
            ("gradhess", gradhess_loop, (phi.arr,)),
        ]:
            print(f"{name:<10s} {slope(fn, *args):8.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
