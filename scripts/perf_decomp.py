"""Decompose the 1024^2 mixed-posterior gradient cost into its parts
(pipelined slope timing). Usage:
    python scripts/perf_decomp.py [N] [f32|high] [auto|matmul|factored|fft] [keys...]

Keys (default all): fwd bwdgrad lnP gradlnP fft2 cov
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def main(N=1024, prec="f32", dmode="auto", keys=None):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim, mix, Mixed
        out = load_sim(thetapix=2, Nside=N, pol="P", T=np.float32, seed=0)
        ds = out["ds"]
        ds = ds.replace(d=ds.d.to(ds.d.basis.with_space("map")))
        f = out["f"].to(out["f"].basis.with_space("map"))
        phi = out["phi"].to(out["phi"].basis.with_space("map"))
        m = mix(ds, f=f, phi=phi)
        f_mix = m["f_mix"].to(f.basis)
        phi_mix = m["phi_mix"].to(phi.basis)
    proj = out["proj"]
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.core.field import Field, fgrad
    from cmblensing_tpu.models.lenseflow import LenseFlow
    from cmblensing_tpu.models.dataset import Mixed
    from cmblensing_tpu.ops import deriv
    deriv.set_deriv_mode(dmode)
    deriv.set_matmul_precision(prec)
    dev = jax.devices()[0]
    ds, f, phi, f_mix, phi_mix = device_put_safe(
        (ds, f, phi, f_mix, phi_mix), dev)
    B_f, B_phi = f.basis, phi.basis

    def pipelined(make_step, x0, R1=3, R2=12):
        step = jax.jit(make_step)
        t0 = time.perf_counter()
        jax.block_until_ready(step(x0))
        print(f"    (compile {time.perf_counter()-t0:.0f}s)", flush=True)

        def t(R):
            ts = []
            for _ in range(3):
                xx = x0
                tt = time.perf_counter()
                for _ in range(R):
                    xx = step(xx)
                jax.block_until_ready(xx)
                ts.append(time.perf_counter() - tt)
            return min(ts)
        return (t(R2) - t(R1)) / (R2 - R1) * 1e3

    eps = np.float32(1e-20)
    mixed = Mixed(ds)
    keys = keys or ["fwd", "bwdgrad", "lnP", "gradlnP", "fft2", "cov"]

    if "fwd" in keys:
        def apply_step(farr):
            return (LenseFlow(Field(phi.arr, B_phi, proj), 7)
                    @ Field(farr, B_f, proj)).arr
        print(f"[{prec}/{dmode}] fwd apply@{N}:    "
              f"{pipelined(apply_step, f.arr):8.2f} ms", flush=True)

    if "bwdgrad" in keys:
        # gradient of the bare lense apply wrt phi: fwd flow + backward
        # (f, df, dphi) flow + gradhess vjp — no covariance ops
        def gradlense_step(pm):
            g = fgrad(lambda p: jnp.sum(
                ((LenseFlow(p, 7) @ Field(f.arr, B_f, proj)).arr
                  * f.arr)))(Field(pm, B_phi, proj))
            return pm + eps * g.arr
        print(f"[{prec}/{dmode}] gradlense@{N}:    "
              f"{pipelined(gradlense_step, phi.arr):8.2f} ms", flush=True)

    if "lnP" in keys:
        def lnp_step(pm):
            v = mixed.logpdf(f_mix=Field(f_mix.arr, B_f, proj),
                             phi_mix=Field(pm, B_phi, proj))
            return pm + eps * jnp.sum(v)
        print(f"[{prec}/{dmode}] lnP@{N}:          "
              f"{pipelined(lnp_step, phi_mix.arr):8.2f} ms", flush=True)

    if "gradlnP" in keys:
        def grad_step(pm):
            g = fgrad(lambda p: jnp.sum(mixed.logpdf(
                f_mix=Field(f_mix.arr, B_f, proj), phi_mix=p)))(
                Field(pm, B_phi, proj))
            return pm + eps * g.arr
        print(f"[{prec}/{dmode}] gradlnP@{N}:      "
              f"{pipelined(grad_step, phi_mix.arr):8.2f} ms", flush=True)

    if "fft2" in keys:
        from cmblensing_tpu.ops import fft as _fft

        def fft_step(a):
            F = _fft.rfft2(a)
            return _fft.irfft2(F * (1.0 + eps), N)
        print(f"[{prec}/{dmode}] rfft2+irfft2 (2 planes)@{N}: "
              f"{pipelined(fft_step, f.arr):8.2f} ms", flush=True)

    if "cov" in keys:
        # one prior quadratic form: f' Cf^-1 f (basis conversions + diag)
        from cmblensing_tpu.models.distributions import MvNormal
        from cmblensing_tpu.models.dataset import _op_call

        def cov_step(farr):
            v = MvNormal(0, _op_call(ds.Cf, {})).logpdf(
                Field(farr, B_f, proj))
            return farr * (1.0 + eps * jnp.sum(v))
        print(f"[{prec}/{dmode}] prior logpdf (Cf)@{N}: "
              f"{pipelined(cov_step, f.arr):8.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         sys.argv[2] if len(sys.argv) > 2 else "f32",
         sys.argv[3] if len(sys.argv) > 3 else "auto",
         sys.argv[4:] or None)
