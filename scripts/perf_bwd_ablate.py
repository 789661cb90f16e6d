"""Ablate the backward-flow velocity at N^2 to find where the scan
time goes (pipelined slope). Also measures factored-apply batching.
Usage: python scripts/perf_bwd_ablate.py [N] [keys...]
Keys: full nodphi nodf fwdonly dphi_only applies
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf
from cmblensing_tpu.ops import deriv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
keys = sys.argv[2:] or ["full", "nodphi", "nodf", "fwdonly", "applies"]
deriv.set_deriv_mode("auto")
deriv.set_matmul_precision("f32")

proj = ProjLambert(N, N, 2.0)
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
df = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi)
g = jax.block_until_ready(g)
c = jnp.float32(1e-3)


def pipelined(step, x0, R1=3, R2=13):
    step = jax.jit(step)
    t0 = time.perf_counter()
    jax.block_until_ready(step(x0))
    print(f"  (compile {time.perf_counter()-t0:.0f}s)", flush=True)

    def t(R):
        ts = []
        for _ in range(3):
            xx = x0
            tt0 = time.perf_counter()
            for _ in range(R):
                xx = step(xx)
            jax.block_until_ready(xx)
            ts.append(time.perf_counter() - tt0)
        return min(ts)
    return (t(R2) - t(R1)) / (R2 - R1) * 1e3


def run_flow(vel, state0):
    def step(s):
        y = lf._rk4(vel, (s[:2], s[2:4], s[4:5]), 1.0, 0.0, 7)
        return s + c * jnp.concatenate([y[0], y[1], y[2]], axis=0)
    return step


st0 = jnp.concatenate([f, df, jnp.zeros((1, N, N), jnp.float32)], axis=0)

if "full" in keys:
    vel = lambda t, y: lf._backward_velocity(t, y, g, h, proj)
    print(f"bwd full:      {pipelined(run_flow(vel, st0), st0):8.2f} ms",
          flush=True)

if "nodphi" in keys:
    def vel_nodphi(t, y):
        ff, dff, dphi = y
        out = lf._backward_velocity(t, y, g, h, proj)
        return (out[0], out[1], jnp.zeros_like(dphi))

    def vel_nodphi2(t, y):
        ff, dff, dphi = y
        px, py = lf._p_t(t, g, h)
        ddf = lf._div(px[..., None, :, :] * dff, py[..., None, :, :] * dff, proj)
        fx, fy = lf._grad_f(ff, proj)
        dfdt = px[..., None, :, :] * fx + py[..., None, :, :] * fy
        return (dfdt, ddf, jnp.zeros_like(dphi))
    print(f"bwd no-dphi:   {pipelined(run_flow(vel_nodphi2, st0), st0):8.2f} ms",
          flush=True)

if "nodf" in keys:
    def vel_nodf(t, y):
        ff, dff, dphi = y
        px, py = lf._p_t(t, g, h)
        fx, fy = lf._grad_f(ff, proj)
        dfdt = px[..., None, :, :] * fx + py[..., None, :, :] * fy
        # keep w/u/dphi math (depends on fx, fy, df) but skip ddf
        m11, m12, m22 = lf._Minv_t(t, h)
        wx = jnp.sum(dff * fx, axis=-3)
        wy = jnp.sum(dff * fy, axis=-3)
        ux = m11 * wx + m12 * wy
        uy = m12 * wx + m22 * wy
        from cmblensing_tpu.ops.deriv import div_plus_dij
        ddphi = div_plus_dij(ux, uy, t * px * ux, t * py * ux,
                             t * px * uy, t * py * uy, proj)[..., None, :, :]
        return (dfdt, jnp.zeros_like(dff), ddphi)
    print(f"bwd no-ddf:    {pipelined(run_flow(vel_nodf, st0), st0):8.2f} ms",
          flush=True)

if "fwdonly" in keys:
    def vel_fwd(t, y):
        ff, dff, dphi = y
        px, py = lf._p_t(t, g, h)
        fx, fy = lf._grad_f(ff, proj)
        dfdt = px[..., None, :, :] * fx + py[..., None, :, :] * fy
        return (dfdt, jnp.zeros_like(dff), jnp.zeros_like(dphi))
    print(f"bwd f-only:    {pipelined(run_flow(vel_fwd, st0), st0):8.2f} ms",
          flush=True)

if "applies" in keys:
    # factored-apply cost vs batch width
    from cmblensing_tpu.ops.deriv import _fd1, _prec
    from cmblensing_tpu.ops.factored_deriv import apply_x, apply_y
    FX1, FY1 = _fd1(proj)
    for k in (1, 2, 4, 6, 12):
        x0 = jnp.asarray(rs.randn(k, N, N).astype(np.float32))

        def stepx(a):
            return a + c * apply_x(a, FX1, _prec())
        tx = pipelined(stepx, x0, R1=4, R2=24)

        def stepy(a):
            return a + c * apply_y(a, FY1, _prec())
        ty = pipelined(stepy, x0, R1=4, R2=24)
        print(f"apply batch={k:2d}: x {tx:7.3f} ms  y {ty:7.3f} ms "
              f"({tx/k*1e3:6.0f} / {ty/k*1e3:6.0f} us/plane)", flush=True)
