"""bf16-STATE backward scan A/B at 1024^2 (the round-2..5 BENCH
thread): measure the backward flow and full mixed gradlnP with the
scan carry (f, delta_f) stored as bfloat16 (CMBL_BWD_STATE_DTYPE=bf16,
models/lenseflow.py::_backward_flow_scan_body), in two compute modes:

  A  strict f32 (HIGHEST) matmuls, f32 state           — baseline
  B  strict f32 matmuls, bf16 state                    — traffic-only
  C  bf16-input matmuls (1-pass, f32 accumulate), bf16 state — fast

and report gradient parity of B and C against A (relative L2 and max).
Usage: python scripts/perf_bf16_state.py [N]
"""
import os
import sys
import time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(N=1024):
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
    from cmblensing_tpu.models.lenseflow import (LenseFlow,
                                                 lenseflow_backend_ctx)
    from cmblensing_tpu.models.dataset import Mixed
    from cmblensing_tpu.ops import deriv
    deriv.set_deriv_mode("auto")
    dev = jax.devices()[0]
    ds, f, phi, f_mix, phi_mix = device_put_safe(
        (ds, f, phi, f_mix, phi_mix), dev)
    B_f, B_phi = f.basis, phi.basis
    mixed = Mixed(ds)
    eps = np.float32(1e-20)

    def pipelined(step, x0, R1=3, R2=12):
        x = step(x0)
        jax.block_until_ready(x)

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

        return (t(R2) - t(R1)) / (R2 - R1) * 1e3

    def bwd_flow_step(farr):
        # raw backward flow: vjp of the apply wrt (phi, f)
        L = LenseFlow(Field(phi.arr, B_phi, proj), 7)

        def go(parr, farr_):
            return (LenseFlow(Field(parr, B_phi, proj), 7)
                    @ Field(farr_, B_f, proj)).arr

        gp, gf = jax.grad(lambda p, ff: jnp.sum(go(p, ff) ** 2),
                          argnums=(0, 1))(phi.arr, farr)
        return farr + eps * gf

    def grad_step(pm):
        g = fgrad(lambda p: jnp.sum(mixed.logpdf(
            f_mix=Field(f_mix.arr, B_f, proj), phi_mix=p)))(
            Field(pm, B_phi, proj))
        return pm + eps * g.arr

    def grad_value(pm):
        return fgrad(lambda p: jnp.sum(mixed.logpdf(
            f_mix=Field(f_mix.arr, B_f, proj), phi_mix=p)))(
            Field(pm, B_phi, proj)).arr

    results = {}
    grads = {}
    for tag, prec, state in [("A f32/f32state", "f32", None),
                             ("B f32/bf16state", "f32", "bf16"),
                             ("C bf16/bf16state", "bf16", "bf16")]:
        if state:
            os.environ["CMBL_BWD_STATE_DTYPE"] = state
        else:
            os.environ.pop("CMBL_BWD_STATE_DTYPE", None)
        deriv.set_matmul_precision(prec)
        with lenseflow_backend_ctx("scan"):
            # fresh jits per variant: the env knob is read at trace time
            tb = pipelined(jax.jit(bwd_flow_step), f.arr)
            tg = pipelined(jax.jit(grad_step), phi_mix.arr)
            gv = np.asarray(jax.device_get(jax.jit(grad_value)(phi_mix.arr)),
                            dtype=np.float64)
        results[tag] = (tb, tg)
        grads[tag] = gv
        print(f"[{tag}] bwdflow: {tb:7.2f} ms   gradlnP: {tg:7.2f} ms",
              flush=True)

    g0 = grads["A f32/f32state"]
    n0 = np.linalg.norm(g0)
    for tag in ("B f32/bf16state", "C bf16/bf16state"):
        d = grads[tag] - g0
        print(f"[{tag}] grad parity vs A: rel-L2 = "
              f"{np.linalg.norm(d)/n0:.3e}  rel-max = "
              f"{np.max(np.abs(d))/np.max(np.abs(g0)):.3e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
