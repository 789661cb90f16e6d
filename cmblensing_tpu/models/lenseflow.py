"""LenseFlow: ODE-based lensing (Millea, Anderes & Wandelt 2019),
TPU-native redesign of the reference implementation
(src/lenseflow.jl, src/flowops.jl).

The lensing operator L(phi) transports a field along the velocity

    df/dt = p(t) . grad(f),    p(t) = (I + t Hess(phi))^-T grad(phi)

integrated t:0->1 with RK4. Design differences vs the reference, all
motivated by TPU hardware:

* No precomputed per-time dictionaries of p and M^-1
  (src/lenseflow.jl:45-60). We keep only grad(phi) (2 planes) and
  Hess(phi) (3 planes, symmetric) and rebuild the 2x2 inverse
  M^-1(t) = adj(I+tH)/det(I+tH) *inside* each RK stage — a handful of
  VPU flops per pixel that XLA fuses into the FFT pipeline, instead of
  15 time-slices of precomputed planes round-tripping through HBM.

* Gradients: a jax.custom_vjp implementing the reference's
  continuous-adjoint transpose-delta flow (negδvelocityᴴ,
  src/lenseflow.jl:176-214): the backward pass integrates the coupled
  (f, delta_f, delta_phi) system t:1->0, re-evolving f backward on the
  fly — O(1) memory in the number of ODE steps, no checkpointing.

* logdet(L) = 0 by construction (src/lenseflow.jl:16).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core.basis import lense_basis
from ..core.field import Field
from ..core.proj import ProjLambert


# =========================================================================
# low-level array kernels (operate on raw (..., ncomp, Ny, Nx) arrays)
# =========================================================================

from ..ops.deriv import gradhess as _deriv_gradhess, grad_xy as _deriv_grad_xy, \
    div_xy as _deriv_div_xy


def _gradhess_phi(phi_map, proj):
    """grad(phi) (2 planes) and Hess(phi) (3 planes: xx, xy, yy) in map
    space, from a (..., 1, Ny, Nx) map-basis phi array."""
    return _deriv_gradhess(phi_map, proj)


def _p_t(t, g, h):
    """p(t) = M^-1(t)^T grad(phi) with M(t) = I + t*Hess(phi), built
    in-flight (2x2 symmetric inverse in closed form)."""
    gx, gy = g
    hxx, hxy, hyy = h
    a = 1 + t * hxx
    b = t * hxy
    d = 1 + t * hyy
    det = a * d - b * b
    # M^-1 = [[d, -b], [-b, a]] / det ; symmetric so transpose is itself
    px = (d * gx - b * gy) / det
    py = (-b * gx + a * gy) / det
    return px, py


def _Minv_t(t, h):
    hxx, hxy, hyy = h
    a = 1 + t * hxx
    b = t * hxy
    d = 1 + t * hyy
    det = a * d - b * b
    return (d / det, -b / det, a / det)  # (m11, m12, m22) symmetric


def _grad_f(f_map, proj):
    """Spatial gradient of each component of a map-space array:
    returns (df/dx, df/dy), each same shape as f_map."""
    return _deriv_grad_xy(f_map, proj)


def _div(vx, vy, proj):
    """Divergence d/dx vx + d/dy vy of map-space arrays (map output)."""
    return _deriv_div_xy(vx, vy, proj)


def _velocity(t, f_map, g, h, proj):
    """df/dt = p(t) . grad(f)  (reference velocity, src/lenseflow.jl:150-161)."""
    px, py = _p_t(t, g, h)
    fx, fy = _grad_f(f_map, proj)
    return px[..., None, :, :] * fx + py[..., None, :, :] * fy


def _velocity_adj(t, f_map, g, h, proj):
    """Adjoint-flow velocity (reference velocityᴴ,
    src/lenseflow.jl:163-174): v = -grad' . (p f) = +div(p f), since
    the adjoint of each derivative is its negative."""
    px, py = _p_t(t, g, h)
    return _div(px[..., None, :, :] * f_map, py[..., None, :, :] * f_map, proj)


# =========================================================================
# RK4 over (t0,t1) with scan, array state
# =========================================================================

import os as _os


def _unroll(proj=None):
    """RK4 scan unroll factor. Fully unrolling the 7-step loop lets
    XLA fuse across step boundaries and drop the scan carry
    materializations (measured at 1024^2 f32: backward flow 17.5 ->
    16.3 ms AND compile 400 -> 80 s); tiny test grids keep the rolled
    loop to bound trace size.

    At >= 4096^2 the ROLLED loop is mandatory: the unrolled backward
    program hands XLA's scheduler a straight-line graph whose chosen
    order keeps ~280 64 MB planes live — the full mixed phi-gradient
    then wants 17.9 GB of HLO temps (> the v5e's 15.75 GB usable HBM)
    regardless of derivative backend, vs 5.8 GB rolled (measured via
    AOT memory_analysis, scripts/probe_grad_mem4096.py). The scan
    carry bounds the live set to one step's working set.
    Override: CMBL_RK4_UNROLL."""
    env = _os.environ.get("CMBL_RK4_UNROLL")
    if env:
        return int(env)
    if proj is not None and max(proj.Ny, proj.Nx) >= 4096:
        return 1   # HBM-bound: see docstring
    if proj is not None and max(proj.Ny, proj.Nx) >= 512:
        return 8   # >= any production nsteps: fully unrolled
    return 1


def _rk4(F, y0, t0, t1, nsteps, proj=None):
    h = (t1 - t0) / nsteps

    def step(y, i):
        t = t0 + i * h
        k1 = F(t, y)
        k2 = F(t + h / 2, jax.tree_util.tree_map(lambda a, b: a + (h / 2) * b, y, k1))
        k3 = F(t + h / 2, jax.tree_util.tree_map(lambda a, b: a + (h / 2) * b, y, k2))
        k4 = F(t + h, jax.tree_util.tree_map(lambda a, b: a + h * b, y, k3))
        y = jax.tree_util.tree_map(
            lambda yy, a, b, c, d: yy + (h / 6) * (a + 2 * (b + c) + d), y, k1, k2, k3, k4)
        return y, None

    y, _ = jax.lax.scan(step, y0, jnp.arange(nsteps), unroll=_unroll(proj))
    return y


# =========================================================================
# integration backend selection (scan of XLA ops vs fused Pallas kernels)
# =========================================================================

_BACKEND = "auto"


def set_lenseflow_backend(backend):
    """'scan'   — lax.scan RK4 over XLA ops (matmul or FFT derivatives
                  per ops/deriv.py). Works everywhere.
       'pallas' — fused Pallas TPU kernels (ops/pallas_lenseflow.py):
                  whole integrations (or single velocity evaluations at
                  sizes where the whole flow exceeds VMEM) run as one
                  kernel with state and derivative matrices VMEM-
                  resident. Interpreted (slow, test-only) off-TPU.
       'auto'   — pallas on TPU when the kernel fits, else scan."""
    global _BACKEND
    assert backend in ("scan", "pallas", "auto")
    _BACKEND = backend


def get_lenseflow_backend():
    return _BACKEND


import contextlib as _contextlib


@_contextlib.contextmanager
def lenseflow_backend_ctx(backend):
    global _BACKEND
    prev = _BACKEND
    set_lenseflow_backend(backend)
    try:
        yield
    finally:
        _BACKEND = prev


def _resolve_backend(arr, proj, nstate_bwd):
    """Pick the integration backend. The pallas path stages through
    jax.lax.platform_dependent (native Mosaic kernel for TPU targets,
    the identical lax.scan integrator for every other platform), so
    'auto' can choose it whenever the kernel fits VMEM without knowing
    where the trace will execute. nstate_bwd is the largest state the
    custom_vjp backward flow will carry (2*ncomp+1)."""
    from ..ops import pallas_lenseflow as _plf
    if _BACKEND == "scan":
        return "scan"
    fits = _plf.flow_available("backward", nstate_bwd, proj.Ny, proj.Nx,
                               arr.dtype)
    if _BACKEND == "pallas":
        if not fits:
            raise ValueError("pallas LenseFlow backend requested but the "
                             "map exceeds the per-stage VMEM budget")
        return "pallas"
    return "pallas" if fits else "scan"


def _kernel_precision():
    from ..ops.deriv import _PRECISION
    return _PRECISION


# =========================================================================
# the differentiable primitive
# =========================================================================

def _mode_ctx_or_null(deriv_mode):
    """Backend pin covering an independently-traced region: the bwd of
    a custom_vjp is traced during the (later) transpose pass, outside
    any `with` the caller held at fwd time — so the resolved mode rides
    the primitives as a static arg and each trace re-enters the ctx."""
    import contextlib
    from ..ops import deriv as _deriv
    return (_deriv.mode_ctx(deriv_mode) if deriv_mode
            else contextlib.nullcontext())


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _lenseflow_apply(phi_map, f_map, t0, t1, nsteps, proj, backend="scan",
                     deriv_mode=None):
    """Integrate f from t0 to t1 under the LenseFlow velocity.
    phi_map: (..., 1, Ny, Nx); f_map: (..., ncomp, Ny, Nx) map arrays."""
    with _mode_ctx_or_null(deriv_mode):
        g, h = _gradhess_phi(phi_map, proj)
        if backend == "pallas":
            from ..ops.pallas_lenseflow import pallas_flow_apply
            return pallas_flow_apply(f_map, g, h, float(t0), float(t1),
                                     int(nsteps), proj, "forward",
                                     _kernel_precision())
        return _rk4(lambda t, y: _velocity(t, y, g, h, proj), f_map, t0, t1,
                    nsteps, proj)


def _lenseflow_fwd(phi_map, f_map, t0, t1, nsteps, proj, backend="scan",
                   deriv_mode=None):
    out = _lenseflow_apply(phi_map, f_map, t0, t1, nsteps, proj, backend,
                           deriv_mode)
    return out, (phi_map, out)


def _backward_velocity(t, state, g, h, proj):
    """Velocity of the coupled (f, delta_f, delta_phi) transpose-delta
    system (reference negδvelocityᴴ, src/lenseflow.jl:176-214)."""
    f, df, dphi = state
    px, py = _p_t(t, g, h)
    m11, m12, m22 = _Minv_t(t, h)

    # d(delta_f)/dt = -grad' . (p delta_f) = +div(p * delta_f)
    ddf = _div(px[..., None, :, :] * df, py[..., None, :, :] * df, proj)

    # df/dt = p . grad f
    fx, fy = _grad_f(f, proj)
    dfdt = px[..., None, :, :] * fx + py[..., None, :, :] * fy

    # d(delta_phi)/dt:
    #   w_i = sum_comp delta_f * (grad f)_i          (2 planes)
    #   u = M^-1 w
    #   ddphi = +div(u) + sum_ij d_i d_j ( t p_j u_i )
    wx = jnp.sum(df * fx, axis=-3)
    wy = jnp.sum(df * fy, axis=-3)
    ux = m11 * wx + m12 * wy
    uy = m12 * wx + m22 * wy
    # div(u) + sum_ij d_i d_j (t p_j u_i), regrouped into 6 matmuls
    # (ops/deriv.py::div_plus_dij; matches the fused pallas B kernel)
    from ..ops.deriv import div_plus_dij
    ddphi = div_plus_dij(ux, uy,
                         t * px * ux, t * py * ux,
                         t * px * uy, t * py * uy, proj)[..., None, :, :]

    return (dfdt, ddf, ddphi)


def _backward_flow_scan(f1, dy, g, h, proj, t1, t0, nsteps):
    """Fast scan implementation of the transpose-delta backward flow.

    Two structural optimizations over a naive RK4 of
    _backward_velocity (measured 20.8 -> ~10 ms per 1024^2 spin-2 flow
    on v5e, scripts/perf_bwd_ablate.py):

    1. The delta_phi accumulation is a LINEAR functional of the
       time-local integrands u and s_ij = t p_j u_i — the spatial
       derivatives commute with the time integral, so instead of
       applying div_plus_dij's 6 derivative matmuls inside every RK
       stage (28 evaluations), the flow accumulates the 6 integrand
       planes (Ux, Uy, S_ij) with pure elementwise RK4 weights and
       applies div_plus_dij ONCE after the scan:

           delta_phi = int_t [div u + sum_ij d_i d_j (t p_j u_i)] dt
                     = div(int u) + sum_ij d_i d_j (int t p_j u_i)

    2. Each stage's derivative work is issued as one batched ddx and
       one batched ddy over [f, p_x delta_f] / [f, p_y delta_f] stacks
       (ops/deriv.py::bwd_stage_derivs) — single-plane applies are
       dispatch-bound on TPU.

    Returns (df0, dphi). Reference math: negδvelocityᴴ,
    src/lenseflow.jl:176-214."""
    from ..ops.deriv import (bwd_stage_derivs, div_plus_dij, div_plus_dij5,
                             bwd_radix_ctx)
    with bwd_radix_ctx():
        return _backward_flow_scan_body(f1, dy, g, h, proj, t1, t0, nsteps,
                                        bwd_stage_derivs, div_plus_dij,
                                        div_plus_dij5)


def _backward_flow_scan_body(f1, dy, g, h, proj, t1, t0, nsteps,
                             bwd_stage_derivs, div_plus_dij, div_plus_dij5):

    hstep = (t0 - t1) / nsteps
    # d_x d_y commutes, so the s_yx and s_xy integrands can be
    # accumulated as ONE summed plane (ops/deriv.py::div_plus_dij5) —
    # 5 accumulator planes instead of 6 in the scan carry and in every
    # stage's integrand traffic. Opt-out knob for A/B
    # (scripts/perf_bwd_floor.py): CMBL_BWD_ACC6=1 restores the 6-plane
    # form.
    acc5 = not _os.environ.get("CMBL_BWD_ACC6")
    # bf16 STATE storage (round-2..5 thread, BENCH.md): carry the
    # (f, delta_f) planes through the scan as bfloat16 so every
    # carry read/write and every stage's derivative-operand read moves
    # half the HBM bytes (the upcast fuses into the consumer; the
    # delta_phi integrand ACCUMULATORS stay f32 — 28 RK-weighted
    # updates in bf16 would lose ~2^-8 relative in the one output that
    # is pure accumulation). Compute stays in the active matmul
    # precision. Costs ~2^-8 relative state rounding per stage:
    # measured gradient parity and MAP convergence rows in BENCH.md.
    state_bf16 = _os.environ.get("CMBL_BWD_STATE_DTYPE") == "bf16"
    cdt = jnp.bfloat16 if state_bf16 else f1.dtype

    def integrands(t, f, df):
        px, py = _p_t(t, g, h)
        m11, m12, m22 = _Minv_t(t, h)
        pxe = px[..., None, :, :]
        pye = py[..., None, :, :]
        fx, fy, ddf = bwd_stage_derivs(f, pxe * df, pye * df, proj)
        dfdt = pxe * fx + pye * fy
        wx = jnp.sum(df * fx, axis=-3)
        wy = jnp.sum(df * fy, axis=-3)
        ux = m11 * wx + m12 * wy
        uy = m12 * wx + m22 * wy
        # accumulator integrands as a TUPLE of planes: the per-stage
        # values fuse straight into the RK-weighted accumulator update
        # without materializing a stacked tensor per stage
        if acc5:
            acc = (ux, uy, t * px * ux, t * (py * ux + px * uy),
                   t * py * uy)
        else:
            acc = (ux, uy, t * px * ux, t * py * ux,
                   t * px * uy, t * py * uy)
        return (dfdt, ddf), acc

    def step(carry, i):
        f, df, acc = carry
        if state_bf16:
            f = f.astype(f1.dtype)
            df = df.astype(f1.dtype)
        t = t1 + i * hstep
        k1, a1 = integrands(t, f, df)
        k2, a2 = integrands(t + hstep / 2,
                            (f + (hstep / 2) * k1[0]).astype(cdt),
                            (df + (hstep / 2) * k1[1]).astype(cdt))
        k3, a3 = integrands(t + hstep / 2,
                            (f + (hstep / 2) * k2[0]).astype(cdt),
                            (df + (hstep / 2) * k2[1]).astype(cdt))
        k4, a4 = integrands(t + hstep,
                            (f + hstep * k3[0]).astype(cdt),
                            (df + hstep * k3[1]).astype(cdt))
        f = (f + (hstep / 6) * (k1[0] + 2 * (k2[0] + k3[0]) + k4[0])).astype(cdt)
        df = (df + (hstep / 6) * (k1[1] + 2 * (k2[1] + k3[1]) + k4[1])).astype(cdt)
        acc = tuple(a + (hstep / 6) * (i1 + 2 * (i2 + i3) + i4)
                    for a, i1, i2, i3, i4 in zip(acc, a1, a2, a3, a4))
        return (f, df, acc), None

    batch = jnp.broadcast_shapes(f1.shape[:-3], dy.shape[:-3],
                                 g[0].shape[:-2])
    f1 = jnp.broadcast_to(f1, batch + f1.shape[-3:])
    dy = jnp.broadcast_to(dy, batch + dy.shape[-3:])
    zplane = jnp.zeros(batch + f1.shape[-2:], f1.dtype)
    from ..ops import deriv as _deriv
    if _deriv._SHARD_AXIS is not None:
        # inside a shard_map body (parallel/spatial.py) the carry must
        # enter the scan with the same varying-manual-axes type it
        # exits with: fresh zeros are replicated, the accumulated
        # integrands inherit every manual axis f1/dy/g vary over
        # (spatial, plus the batch mesh axis on a 2-D mesh)
        vma = set()
        for a in (f1, dy, g[0]):
            vma |= set(getattr(jax.typeof(a), "vma", ()))
        if vma:
            if hasattr(jax.lax, "pcast"):
                zplane = jax.lax.pcast(zplane, tuple(sorted(vma)),
                                       to="varying")
            else:  # pre-0.9 jax
                zplane = jax.lax.pvary(zplane, tuple(sorted(vma)))
    acc0 = (zplane,) * (5 if acc5 else 6)
    (f0, df0, acc), _ = jax.lax.scan(step,
                                     (f1.astype(cdt), dy.astype(cdt), acc0),
                                     jnp.arange(nsteps), unroll=_unroll(proj))
    if state_bf16:
        df0 = df0.astype(f1.dtype)
    if acc5:
        dphi = div_plus_dij5(acc[0], acc[1], acc[2], acc[3],
                             acc[4], proj)[..., None, :, :]
    else:
        dphi = div_plus_dij(acc[0], acc[1], acc[2], acc[3], acc[4], acc[5],
                            proj)[..., None, :, :]
    return df0, dphi


def _lenseflow_bwd(t0, t1, nsteps, proj, backend, deriv_mode, res, dy):
    """Continuous adjoint: integrate the coupled (f, delta_f, delta_phi)
    system backward t1->t0 (reference negδvelocityᴴ,
    src/lenseflow.jl:176-214), starting from (f(t1), cotangent, 0)."""
    phi_map, f1 = res
    with _mode_ctx_or_null(deriv_mode):
        g, h = _gradhess_phi(phi_map, proj)
        if backend == "pallas":
            from ..ops.pallas_lenseflow import pallas_flow_bwd
            return pallas_flow_bwd(dy, f1, g, h, float(t0), float(t1),
                                   int(nsteps), proj, _kernel_precision())

        df0, dphi = _backward_flow_scan(f1, dy, g, h, proj, t1, t0, nsteps)
    return (dphi, df0)


_lenseflow_apply.defvjp(_lenseflow_fwd, _lenseflow_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _lenseflow_apply_adjoint(phi_map, f_map, t0, t1, nsteps, proj,
                             backend="scan", deriv_mode=None):
    """Apply L(phi)^dagger (or its inverse-adjoint depending on t0/t1
    direction): integrate the adjoint velocity backward
    (reference flowops.jl:12)."""
    with _mode_ctx_or_null(deriv_mode):
        g, h = _gradhess_phi(phi_map, proj)
        if backend == "pallas":
            from ..ops.pallas_lenseflow import pallas_flow_apply
            return pallas_flow_apply(f_map, g, h, float(t1), float(t0),
                                     int(nsteps), proj, "adjoint",
                                     _kernel_precision())
        return _rk4(lambda t, y: _velocity_adj(t, y, g, h, proj), f_map, t1,
                    t0, nsteps, proj)


def _lenseflow_adj_fwd(phi_map, f_map, t0, t1, nsteps, proj, backend="scan",
                       deriv_mode=None):
    out = _lenseflow_apply_adjoint(phi_map, f_map, t0, t1, nsteps, proj,
                                   backend, deriv_mode)
    return out, (phi_map, f_map)


def _lenseflow_adj_bwd(t0, t1, nsteps, proj, backend, deriv_mode, res, u):
    """VJP of out = L(phi)^H f via <u, L^H f> = <L u, f>:
    the f-cotangent is the FORWARD apply of u, and the phi-cotangent is
    the transpose-delta flow evaluated with (primal := u, cotangent :=
    f) — reusing the forward flow's machinery exactly (a pallas_call
    has no AD rule of its own, so the adjoint apply needs this explicit
    custom_vjp to stay differentiable under the fused backend)."""
    phi_map, f_map = res
    Lu = _lenseflow_apply(phi_map, u, t0, t1, nsteps, proj, backend,
                          deriv_mode)
    dphi, _ = _lenseflow_bwd(t0, t1, nsteps, proj, backend, deriv_mode,
                             (phi_map, Lu), f_map)
    return (dphi, Lu)


_lenseflow_apply_adjoint.defvjp(_lenseflow_adj_fwd, _lenseflow_adj_bwd)


# =========================================================================
# public operator
# =========================================================================

@jax.tree_util.register_pytree_node_class
class LenseFlow:
    """LenseFlow lensing operator L(phi).

    L @ f          lense (t:0->1)
    L.solve(f)     inverse lense (t:1->0)
    L.H @ f        adjoint
    L.H.solve(f)   inverse adjoint
    logdet = 0 for all phi (src/lenseflow.jl:16).
    """

    __slots__ = ("phi", "nsteps", "t0", "t1", "_adjoint")

    def __init__(self, phi: Field, nsteps: int = 7, t0=0.0, t1=1.0, _adjoint=False):
        self.phi = phi
        self.nsteps = nsteps
        self.t0 = t0
        self.t1 = t1
        self._adjoint = _adjoint

    def tree_flatten(self):
        return (self.phi,), (self.nsteps, self.t0, self.t1, self._adjoint)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def __call__(self, phi_or_theta):
        """L(phi') re-binds phi (reference `(Lϕ::CachedLenseFlow)(ϕ)`),
        L(theta-dict) is a no-op."""
        if isinstance(phi_or_theta, Field):
            return LenseFlow(phi_or_theta, self.nsteps, self.t0, self.t1, self._adjoint)
        return self

    @property
    def H(self):
        return LenseFlow(self.phi, self.nsteps, self.t0, self.t1, not self._adjoint)

    def _phi_map(self):
        return self.phi.to(self.phi.basis.with_space("map")).arr

    def _go(self, f: Field, t0, t1, adjoint):
        from ..ops import deriv as _deriv
        B = f.basis
        fl = f.to(lense_basis(B))
        phi_map = self._phi_map()
        farr = fl.arr
        # broadcast phi/f to a common batch OUTSIDE the custom_vjp:
        # jax's own broadcast_to transpose then sums the cotangents over
        # the broadcast axes (the primitive's bwd contract needs
        # matching shapes), and the scan carry keeps a fixed shape
        if phi_map.shape[:-3] != farr.shape[:-3]:
            batch = jnp.broadcast_shapes(phi_map.shape[:-3],
                                         farr.shape[:-3])
            phi_map = jnp.broadcast_to(phi_map, batch + phi_map.shape[-3:])
            farr = jnp.broadcast_to(farr, batch + farr.shape[-3:])
        nstate_bwd = 2 * farr.shape[-3] + 1
        backend = _resolve_backend(farr, f.proj, nstate_bwd)
        # pin the derivative backend while inputs are still concrete:
        # inside the scan the placement check only sees tracers. The
        # mode rides the primitives as a STATIC arg so the custom_vjp
        # backward — traced later, outside any ctx held here — resolves
        # the SAME backend as the forward.
        deriv_mode = None
        if _deriv.get_deriv_mode() == "auto":
            # delegate to the same policy _backend would apply eagerly
            # (factored / matmul / fft, precision- and size-aware)
            deriv_mode = _deriv._backend(f.proj, farr)
        if adjoint:
            out = _lenseflow_apply_adjoint(phi_map, farr, t0, t1,
                                           self.nsteps, f.proj, backend,
                                           deriv_mode)
        else:
            out = _lenseflow_apply(phi_map, farr, t0, t1,
                                   self.nsteps, f.proj, backend,
                                   deriv_mode)
        return Field(out, fl.basis, f.proj).to(B)

    def __matmul__(self, f: Field) -> Field:
        if self._adjoint:
            # L' f: adjoint flow integrated t1->t0 (flowops.jl:12)
            return self._go(f, self.t0, self.t1, adjoint=True)
        return self._go(f, self.t0, self.t1, adjoint=False)

    def solve(self, f: Field) -> Field:
        if self._adjoint:
            return self._go(f, self.t1, self.t0, adjoint=True)
        return self._go(f, self.t1, self.t0, adjoint=False)

    def inv(self):
        return LenseFlow(self.phi, self.nsteps, self.t1, self.t0, self._adjoint)

    pinv = inv

    def __repr__(self):
        return f"LenseFlow(nsteps={self.nsteps}{', adjoint' if self._adjoint else ''})"


def lense(phi: Field, f: Field, nsteps: int = 7) -> Field:
    """Functional form: lense f by phi."""
    return LenseFlow(phi, nsteps) @ f


def get_max_lensing_step(phi: Field, eta: Field):
    """Max alpha s.t. I + Hess(phi + alpha*eta) keeps positive
    discriminant everywhere (weak-lensing guard,
    src/lenseflow.jl:232-256)."""
    from ..core.ops import gradhess
    _, H = gradhess(phi)
    _, He = gradhess(eta)
    to_map = lambda x: x.to(x.basis.with_space("map")).arr
    pxx, pxy, pyy = to_map(H[0][0]), to_map(H[0][1]), to_map(H[1][1])
    exx, exy, eyy = to_map(He[0][0]), to_map(He[0][1]), to_map(He[1][1])
    a = exx * eyy - exy ** 2
    b = exx * (1 + pyy) + eyy * (1 + pxx) - 2 * exy * pxy
    c = (1 + pxx) * (1 + pyy) - pxy ** 2
    disc = jnp.sqrt(b ** 2 - 4 * a * c)
    a1 = (-b + disc) / (2 * a)
    a2 = (-b - disc) / (2 * a)
    big = jnp.asarray(np.inf, a1.dtype)
    pos_min = lambda x: jnp.min(jnp.where(x > 0, x, big))
    return jnp.minimum(pos_min(a1), pos_min(a2))
