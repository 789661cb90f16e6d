"""TPU perf probe: times LenseFlow apply variants with an in-graph
repetition loop (fori_loop) so remote-dispatch latency cancels.

Per-iteration time = (t(K2) - t(K1)) / (K2 - K1).
"""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def main(N=256, pol="P"):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=3, Nside=N, pol=pol, T=np.float32, seed=0)
        f = out["f"].to(out["f"].basis.with_space("map"))
        phi = out["phi"].to(out["phi"].basis.with_space("map"))
    proj = out["proj"]
    from cmblensing_tpu.utils.transfer import device_put_safe
    dev = jax.devices()[0]
    farr, parr = device_put_safe((f.arr, phi.arr), dev)

    from cmblensing_tpu.models.lenseflow import _gradhess_phi, _rk4, _velocity
    from cmblensing_tpu.ops import deriv
    from cmblensing_tpu.ops.pallas_lenseflow import pallas_lenseflow_apply

    def timed_pair(make_fn, label):
        try:
            fn1 = make_fn(2)
            fn2 = make_fn(12)
            # warmup (also compiles)
            float(jnp.sum(fn1(farr, parr)))
            float(jnp.sum(fn2(farr, parr)))
            def t(fn, reps=6):
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(jnp.sum(fn(farr, parr)))
                    ts.append(time.perf_counter() - t0)
                return min(ts)
            t1, t2 = t(fn1), t(fn2)
            per = (t2 - t1) / 10 * 1e3
            print(f"{label:<28s}: {per:8.3f} ms/apply   (t2={t2*1e3:.1f} t1={t1*1e3:.1f})",
                  flush=True)
            return per
        except Exception as e:
            print(f"{label:<28s}: FAILED {repr(e)[:120]}", flush=True)
            return None

    def make_scan(mode):
        def mk(K):
            @jax.jit
            def go(farr, parr):
                deriv.set_deriv_mode(mode)
                g, h = _gradhess_phi(parr, proj)
                def body(i, y):
                    return _rk4(lambda t, y: _velocity(t, y, g, h, proj), y, 0., 1., 7)
                out = jax.lax.fori_loop(0, K, body, farr)
                deriv.set_deriv_mode("auto")
                return out
            return go
        return mk

    def make_pallas(K):
        @jax.jit
        def go(farr, parr):
            deriv.set_deriv_mode("matmul")
            g, h = _gradhess_phi(parr, proj)
            deriv.set_deriv_mode("auto")
            def body(i, y):
                return pallas_lenseflow_apply(y, g, h, 0., 1., 7, proj)
            return jax.lax.fori_loop(0, K, body, farr)
        return go

    print(f"=== N={N} pol={pol} ===", flush=True)
    timed_pair(make_scan("fft"), "scan + XLA FFT derivs")
    timed_pair(make_scan("matmul"), "scan + matmul derivs")
    timed_pair(make_pallas, "fused pallas kernel")

    # correctness cross-check (realistic phi, weak lensing); the fused
    # kernel only exists for VMEM-resident sizes
    if N > 512:
        print("pallas cross-check skipped (map exceeds VMEM kernel limit)",
              flush=True)
        return
    deriv.set_deriv_mode("matmul")
    g, h = jax.jit(lambda p: _gradhess_phi(p, proj))(parr)
    a = jax.jit(lambda f, g, h: _rk4(lambda t, y: _velocity(t, y, g, h, proj), f, 0., 1., 7))(farr, g, h)
    b = pallas_lenseflow_apply(farr, g, h, 0., 1., 7, proj)
    deriv.set_deriv_mode("auto")
    num = float(jnp.max(jnp.abs(a - b)))
    den = float(jnp.max(jnp.abs(a)))
    print(f"pallas vs scan rel: {num/den:.2e}", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=256)
    ap.add_argument("--pol", default="P")
    a = ap.parse_args()
    main(a.N, a.pol)
