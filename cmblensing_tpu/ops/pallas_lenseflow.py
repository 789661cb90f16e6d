"""Fused LenseFlow integration as Pallas TPU kernels.

The LenseFlow ODE velocity (SURVEY.md section 3.2, reference
src/lenseflow.jl:150-214) and its adjoint/transpose-delta variants are,
with circulant-matmul spectral derivatives (ops/deriv.py), chains of
NxN matmuls glued by elementwise work. XLA runs each matmul as a
separate HBM-level op; these kernels fuse a whole velocity evaluation
— and, when VMEM allows, the *entire* RK4 integration — into single
Pallas programs that keep the ODE state, the derivative matrices and
grad/Hess(phi) resident in VMEM and feed the MXU back-to-back.

Three flows (mirroring models/lenseflow.py, which cites the reference):

  forward   df/dt = p(t) . grad f                 (velocity)
  adjoint   df/dt = div(p(t) f)                   (velocityᴴ)
  backward  coupled (f, delta_f, delta_phi) transpose-delta flow
            (negδvelocityᴴ, src/lenseflow.jl:176-214)

Granularity is chosen by a VMEM plane-count estimate (the v5e has
128MB of raw VMEM — measured — but matmul kernels see a ~85MB usable
ceiling from Mosaic staging overhead):

  'flow' — one pallas_call integrates all nsteps RK4 steps, zero HBM
           traffic between stages. Used when the whole BACKWARD
           integration fits VMEM (<=~512^2; measured 256^2: backward
           0.53ms fused vs 0.80ms scan).
  above  — the pallas backend degenerates to the identical lax.scan
           integrator: measured at 1024^2 f32, XLA's tuned matmul
           emitters beat per-velocity Mosaic kernels for every flow
           (fwd scan 9.9ms vs fused 14.4ms; per backward flow ~27ms
           vs 39.8ms; full gradlnP 78.9ms vs 108.8ms) — when there is
           no VMEM-residency to win, fusion does not pay on this
           toolchain.

The role-switched universal kernel ('uni', CMBL_FORCE_UNI=1) remains
implemented and tested for future toolchains/generations; it exists
because the remote compile helper aborts on programs containing two
distinct large Mosaic kernels, and production programs mix flows
(CG = forward+adjoint, gradlnP = forward+backward). Fused kernels
engage only for single-instance (unbatched, unvmapped) flows — under
vmap or a batch axis the scan's big batched GEMMs win on the MXU.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .deriv import _deriv_matrices

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


# v5e VMEM is 128MB raw (measured: a trivial copy kernel fits 64MB in +
# 64MB out), but matmul kernels carry Mosaic staging overhead: a fused
# velocity kernel compiles at an ~83MB live-plane estimate and fails at
# ~95MB. Budget 85MB steers granularity selection to what the hardware
# actually accepts. Override with CMBL_PALLAS_VMEM_MB.
_VMEM_BUDGET_MB = float(os.environ.get("CMBL_PALLAS_VMEM_MB", "85"))

# delta-phi term of the split backward velocity: 'pallas' (role-B of
# the unified kernel) or 'xla' (plain matmuls — one kernel type per
# program, safest for the remote compile helper)
_SPLIT_DPHI_BACKEND = os.environ.get("CMBL_SPLIT_DPHI", "pallas")


def _is_vmapped(x):
    """Is x a vmap (BatchTracer) tracer? isinstance against the real
    class when importable, class-name match as a version-proof
    fallback."""
    try:
        from jax.interpreters.batching import BatchTracer
        return isinstance(x, BatchTracer)
    except Exception:
        return type(x).__name__ == "BatchTracer"


def _make_ddx_ddy(DxT, Dy, precision):
    """In-kernel derivative matmuls. Mosaic only lowers
    Precision.HIGHEST/DEFAULT, so 'high' (3-pass bf16, ~2^-21 relative)
    is emulated explicitly: split each operand into a bf16 head + bf16
    residual and sum the three significant cross products with f32
    accumulation — the same arithmetic XLA emits for Precision.HIGH."""
    if precision == "bf16":
        DxTb = DxT.astype(jnp.bfloat16)
        Dyb = Dy.astype(jnp.bfloat16)

        def ddx(a):
            return jnp.dot(a.astype(jnp.bfloat16), DxTb,
                           preferred_element_type=jnp.float32)

        def ddy(a):
            return jnp.dot(Dyb, a.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    elif precision == "high":
        bf = jnp.bfloat16
        Dx_h = DxT.astype(bf)
        Dx_l = (DxT - Dx_h.astype(jnp.float32)).astype(bf)
        Dy_h = Dy.astype(bf)
        Dy_l = (Dy - Dy_h.astype(jnp.float32)).astype(bf)

        def ddx(a):
            ah = a.astype(bf)
            al = (a - ah.astype(jnp.float32)).astype(bf)
            return (jnp.dot(ah, Dx_h, preferred_element_type=jnp.float32)
                    + jnp.dot(ah, Dx_l, preferred_element_type=jnp.float32)
                    + jnp.dot(al, Dx_h, preferred_element_type=jnp.float32))

        def ddy(a):
            ah = a.astype(bf)
            al = (a - ah.astype(jnp.float32)).astype(bf)
            return (jnp.dot(Dy_h, ah, preferred_element_type=jnp.float32)
                    + jnp.dot(Dy_l, ah, preferred_element_type=jnp.float32)
                    + jnp.dot(Dy_h, al, preferred_element_type=jnp.float32))
    else:
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

        def ddx(a):
            return jnp.dot(a, DxT, **kw)

        def ddy(a):
            return jnp.dot(Dy, a, **kw)
    return ddx, ddy




# =========================================================================
# factored in-kernel derivatives (ops/factored_deriv.py inside Mosaic)
# =========================================================================
#
# The radix-B block-diagonalized circulant replaces each in-kernel
# N x N derivative matmul with B-ish (A x A) dots plus add/sub
# butterflies (B = 4: all weights 0/+-1). Same f32-parity operator,
# ~2.7x fewer MXU MACs at 1024^2 and 4x less VMEM spent on matrices.
# Packed layout per axis: (C, A, A) with C = 2 + 2*(B/2 - 1), rows
# [G_0, G_{B/2}, Ar_1..Ar_{nc}, Ai_1..Ai_{nc}]; x-axis blocks are
# stored pre-transposed so ddx is right-multiplication.

def _fact_meta(n, delta, dtype):
    from .factored_deriv import _factored_ops
    from .deriv import _pick_B_measured
    B = _pick_B_measured(n)
    op = _factored_ops(n, delta, str(np.dtype(dtype)), B)[0]
    return op, B


def _pack_factored(op, transpose):
    nc = len(op.kcx)
    blocks = [op.Gre[0], op.Gre[1]]
    for i in range(nc):
        blocks.append(op.Gar[i])
    for i in range(nc):
        blocks.append(op.Gai[i])
    arr = np.stack([b.T.copy() if transpose else b for b in blocks])
    return arr


_FMATS_CACHE = {}


def _fmats_cached(Nx, Ny, delta, dtype_str):
    from .deriv import cache_concrete
    return cache_concrete(
        _FMATS_CACHE, (Nx, Ny, delta, dtype_str),
        lambda: _fmats_for_uncached(_P(Nx, Ny, delta, dtype_str),
                                    np.dtype(dtype_str)))


class _P:
    """Hashable proj stand-in for the mats caches."""

    def __init__(self, Nx, Ny, delta, dts):
        self.Nx, self.Ny, self.deltax = Nx, Ny, delta


def _fmats_for(proj, dtype):
    return _fmats_cached(proj.Nx, proj.Ny, float(proj.deltax),
                         str(np.dtype(dtype)))


def _fmats_for_uncached(proj, dtype):
    """((FXt, FY), fmeta) packed factored first-derivative tensors, or
    (None, None) when no radix pays on either axis."""
    from .deriv import _pick_B_measured
    if _pick_B_measured(proj.Nx) <= 1 or _pick_B_measured(proj.Ny) <= 1:
        return None, None
    d = float(proj.deltax)
    opx, Bx = _fact_meta(proj.Nx, d, dtype)
    opy, By = _fact_meta(proj.Ny, d, dtype)
    fmeta = ((Bx, opx.A, opx.Rf, opx.Ri), (By, opy.A, opy.Rf, opy.Ri))
    with jax.ensure_compile_time_eval():
        return (jnp.asarray(_pack_factored(opx, True)),
                jnp.asarray(_pack_factored(opy, False))), fmeta


def _kcomb(planes, weights):
    """In-kernel butterfly: sum_r w_r * plane_r with 0/+-1 fast paths."""
    acc = None
    for w, x in zip(weights, planes):
        w = float(w)
        if w == 0.0:
            continue
        term = x if w == 1.0 else (-x if w == -1.0 else x * w)
        acc = term if acc is None else acc + term
    return acc


def _mk_dot(precision):
    if precision == "bf16":
        def dot(M, v, right=False):
            args = (v.astype(jnp.bfloat16), M.astype(jnp.bfloat16)) if right \
                else (M.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
            return jnp.dot(*args, preferred_element_type=jnp.float32)
        return dot
    if precision == "high":
        bf = jnp.bfloat16

        def dot(M, v, right=False):
            Mh = M.astype(bf)
            Ml = (M - Mh.astype(jnp.float32)).astype(bf)
            vh = v.astype(bf)
            vl = (v - vh.astype(jnp.float32)).astype(bf)
            kw = dict(preferred_element_type=jnp.float32)
            if right:
                return (jnp.dot(vh, Mh, **kw) + jnp.dot(vh, Ml, **kw)
                        + jnp.dot(vl, Mh, **kw))
            return (jnp.dot(Mh, vh, **kw) + jnp.dot(Ml, vh, **kw)
                    + jnp.dot(Mh, vl, **kw))
        return dot

    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)

    def dot(M, v, right=False):
        return jnp.dot(v, M, **kw) if right else jnp.dot(M, v, **kw)
    return dot


def _fact_apply(a, G, meta, dot, side):
    """Apply one factored circulant to a 2-D value inside a kernel.
    side='y': row blocks, left dots. side='x': column blocks, right
    dots against pre-transposed blocks."""
    B, A, Rf, Ri = meta
    nc = B // 2 - 1
    right = side == "x"
    if right:
        xs = [a[:, r * A:(r + 1) * A] for r in range(B)]
    else:
        xs = [a[r * A:(r + 1) * A, :] for r in range(B)]
    us = [_kcomb(xs, Rf[c]) for c in range(B)]
    ys = [None] * B
    ys[0] = dot(G[0], us[0], right)
    ys[B - 1] = dot(G[1], us[B - 1], right)
    for i in range(nc):
        ur, ui = us[2 * i + 1], us[2 * i + 2]
        Ar, Ai = G[2 + i], G[2 + nc + i]
        ys[2 * i + 1] = dot(Ar, ur, right) - dot(Ai, ui, right)
        ys[2 * i + 2] = dot(Ai, ur, right) + dot(Ar, ui, right)
    outs = [_kcomb(ys, Ri[r]) for r in range(B)]
    return jnp.concatenate(outs, axis=1 if right else 0)


def _make_ddx_ddy_fact(FXt, FY, precision, fmeta):
    mx, my = fmeta
    dot = _mk_dot(precision)

    def ddx(a):
        return _fact_apply(a, FXt, mx, dot, "x")

    def ddy(a):
        return _fact_apply(a, FY, my, dot, "y")
    return ddx, ddy


def _make_dd_any(dxt, dy, precision, fmeta=None):
    """Derivative closures from either dense (N, N) mats or packed
    (C, A, A) factored tensors."""
    if fmeta is not None:
        return _make_ddx_ddy_fact(dxt, dy, precision, fmeta)
    return _make_ddx_ddy(dxt, dy, precision)


@functools.lru_cache(maxsize=None)
def _fmeta_from_key(fkey):
    """Rebuild the static butterfly metadata from the hashable kernel
    key (Nx, Ny, delta, dtype_str)."""
    Nx, Ny, delta, dts = fkey
    opx, Bx = _fact_meta(Nx, delta, np.dtype(dts))
    opy, By = _fact_meta(Ny, delta, np.dtype(dts))
    return ((Bx, opx.A, opx.Rf, opx.Ri), (By, opy.A, opy.Rf, opy.Ri))


def _p_of_t(t, gx, gy, hxx, hxy, hyy):
    a = 1.0 + t * hxx
    b = t * hxy
    d = 1.0 + t * hyy
    idet = 1.0 / (a * d - b * b)
    px = (d * gx - b * gy) * idet
    py = (-b * gx + a * gy) * idet
    return px, py


def _minv_of_t(t, hxx, hxy, hyy):
    a = 1.0 + t * hxx
    b = t * hxy
    d = 1.0 + t * hyy
    idet = 1.0 / (a * d - b * b)
    return d * idet, -b * idet, a * idet  # (m11, m12, m22)


def _vel_forward(t, y, phi_planes, ddx, ddy):
    """v_c = p . grad y_c (reference src/lenseflow.jl:150-161)."""
    gx, gy, hxx, hxy, hyy = phi_planes
    px, py = _p_of_t(t, gx, gy, hxx, hxy, hyy)
    return [px * ddx(yc) + py * ddy(yc) for yc in y]


def _vel_adjoint(t, y, phi_planes, ddx, ddy):
    """v_c = div(p y_c) (reference velocityᴴ, src/lenseflow.jl:163-174)."""
    gx, gy, hxx, hxy, hyy = phi_planes
    px, py = _p_of_t(t, gx, gy, hxx, hxy, hyy)
    return [ddx(px * yc) + ddy(py * yc) for yc in y]


def _vel_backward(t, y, phi_planes, ddx, ddy, ncomp):
    """Coupled transpose-delta velocity (reference negδvelocityᴴ,
    src/lenseflow.jl:176-214). State y = [f_0..f_{c-1},
    df_0..df_{c-1}, dphi]; matches models/lenseflow.py::_lenseflow_bwd
    term by term, with the div/dij matmuls regrouped as
        ddphi = ddx(ux + ddx(A) + ddy(B)) + ddy(uy + ddx(C) + ddy(D))
    (6 matmuls instead of 10)."""
    gx, gy, hxx, hxy, hyy = phi_planes
    f = y[:ncomp]
    df = y[ncomp:2 * ncomp]
    px, py = _p_of_t(t, gx, gy, hxx, hxy, hyy)
    m11, m12, m22 = _minv_of_t(t, hxx, hxy, hyy)

    out_f = []
    out_df = []
    wx = None
    wy = None
    for c in range(ncomp):
        fx = ddx(f[c])
        fy = ddy(f[c])
        out_f.append(px * fx + py * fy)                     # df/dt
        out_df.append(ddx(px * df[c]) + ddy(py * df[c]))    # d(delta_f)/dt
        wx = df[c] * fx if wx is None else wx + df[c] * fx
        wy = df[c] * fy if wy is None else wy + df[c] * fy
    ux = m11 * wx + m12 * wy
    uy = m12 * wx + m22 * wy
    # d(delta_phi)/dt = div(u) + sum_ij d_i d_j (t p_j u_i), regrouped
    ddphi = (ddx(ux + ddx(t * px * ux) + ddy(t * py * ux))
             + ddy(uy + ddx(t * px * uy) + ddy(t * py * uy)))
    return out_f + out_df + [ddphi]


_VELS = {"forward": _vel_forward, "adjoint": _vel_adjoint,
         "backward": _vel_backward}


def _rk4_steps(vel, y, t0, t1, nsteps):
    """Classical RK4 over a list-of-planes state, inside a kernel. The
    step loop is a lax.fori_loop so the Mosaic program holds ONE step's
    code (4 velocity evaluations) instead of nsteps unrolled copies —
    cuts compile time ~nsteps-fold with identical VMEM residency.

    Scheduled for MINIMAL liveness: the classical k1..k4 form keeps
    6*nstate planes live and spilled ~108MB of vector registers at
    1024^2; folding each k into a running accumulator the moment it is
    produced (y, acc, stage, k = 4*nstate planes) fits the same kernel
    in VMEM. Same RK4 map up to f32 summation order."""
    h = (t1 - t0) / nsteps
    n = len(y)

    def body(i, y):
        y = list(y)
        t = t0 + i.astype(y[0].dtype) * h
        k = vel(t, y)                                       # k1
        acc = [y[c] + (h / 6) * k[c] for c in range(n)]
        s = [y[c] + (h / 2) * k[c] for c in range(n)]
        k = vel(t + h / 2, s)                               # k2
        acc = [acc[c] + (h / 3) * k[c] for c in range(n)]
        s = [y[c] + (h / 2) * k[c] for c in range(n)]
        k = vel(t + h / 2, s)                               # k3
        acc = [acc[c] + (h / 3) * k[c] for c in range(n)]
        s = [y[c] + h * k[c] for c in range(n)]
        k = vel(t + h, s)                                   # k4
        return tuple(acc[c] + (h / 6) * k[c] for c in range(n))

    return list(jax.lax.fori_loop(0, nsteps, body, tuple(y)))


def _plane_mb(Ny, Nx, dtype):
    return Ny * Nx * np.dtype(dtype).itemsize / 2 ** 20


def _flow_fits(kind, nstate, Ny, Nx, dtype):
    """Conservative live-plane estimate for the whole-flow kernel:
    inputs (5 phi planes + 2 derivative matrices + nstate) + outputs
    (nstate) + RK4 working set (4x nstate) + velocity temporaries."""
    temps = {"forward": 4, "adjoint": 4, "backward": 10}[kind]
    planes = 5 + nstate * 6 + temps
    mats = _plane_mb(Ny, Ny, dtype) + _plane_mb(Nx, Nx, dtype)
    return planes * _plane_mb(Ny, Nx, dtype) + mats <= _VMEM_BUDGET_MB


def _compiler_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(127 * 2 ** 20))


_MATS_FOR_CACHE = {}


def _mats_for_cached(Nx, Ny, delta, dts):
    from .deriv import cache_concrete

    def make():
        Dx1, _ = _deriv_matrices(Nx, delta, dts)
        Dy1, _ = _deriv_matrices(Ny, delta, dts)
        with jax.ensure_compile_time_eval():
            return jnp.asarray(Dx1.T.copy()), jnp.asarray(Dy1)
    return cache_concrete(_MATS_FOR_CACHE, (Nx, Ny, delta, dts), make)


def _mats_for(proj, dtype):
    return _mats_for_cached(proj.Nx, proj.Ny, float(proj.deltax),
                            str(np.dtype(dtype)))


# scan-equivalent fallbacks (models/lenseflow.py implementations) used
# as the non-TPU branch of jax.lax.platform_dependent: the TPU plugin
# registers itself regardless of JAX_PLATFORMS, so "which platform will
# this trace run on" is only decidable at lowering time — emitting both
# branches and letting the lowering pick keeps the pallas backend safe
# under jit/vmap on any device.

def _scan_fallback(state, phi_planes, proj, kind, nsteps, t0, t1):
    from ..models import lenseflow as lf
    g = phi_planes[:2]
    h = phi_planes[2:]
    if kind == "forward":
        return lf._rk4(lambda t, y: lf._velocity(t, y, g, h, proj),
                       state, t0, t1, nsteps, proj)
    if kind == "adjoint":
        return lf._rk4(lambda t, y: lf._velocity_adj(t, y, g, h, proj),
                       state, t0, t1, nsteps, proj)
    # backward: state = [f, df, dphi] stacked on the component axis;
    # t0/t1 here arrive already swapped (integrating t1 -> t0)
    ncomp = (state.shape[-3] - 1) // 2
    f1 = state[..., :ncomp, :, :]
    dy = state[..., ncomp:2 * ncomp, :, :]
    df0, dphi = lf._backward_flow_scan(f1, dy, g, h, proj, t0, t1, nsteps)
    f0 = jnp.zeros_like(f1)  # callers only consume the df/dphi slots
    return jnp.concatenate([f0, df0, dphi], axis=-3)


# =========================================================================
# whole-flow kernels
# =========================================================================

def _flow_kernel(*refs, kind, nstate, ncomp, nsteps, t0, t1, precision,
                 fkey=None):
    # refs: state, gx, gy, hxx, hxy, hyy, DxT|FXt, Dy|FY, out
    state_ref = refs[0]
    gx, gy, hxx, hxy, hyy = (refs[i][:] for i in range(1, 6))
    ddx, ddy = _make_dd_any(refs[6][:], refs[7][:], precision,
                            _fmeta_from_key(fkey) if fkey else None)
    out_ref = refs[8]
    phi_planes = (gx, gy, hxx, hxy, hyy)
    base = _VELS[kind]
    if kind == "backward":
        vel = lambda t, y: base(t, y, phi_planes, ddx, ddy, ncomp)
    else:
        vel = lambda t, y: base(t, y, phi_planes, ddx, ddy)
    y = [state_ref[c] for c in range(nstate)]
    y = _rk4_steps(vel, y, t0, t1, nsteps)
    for c in range(nstate):
        out_ref[c] = y[c]


# =========================================================================
# component-gridded forward/adjoint whole-flow kernel ("fa"): each
# component of a forward or adjoint flow evolves INDEPENDENTLY, so the
# kernel runs on a grid over the component axis with a single-plane
# state — the live set (y, acc, stage, k = 4 planes + 5 phi planes +
# velocity transients) fits VMEM at 1024^2 where the all-component
# whole-flow kernel spills (measured 138.7MB > 128MB). The flow kind
# (forward/adjoint) and integration bounds (t0, t1) arrive as SMEM
# scalars, NOT static constants, so every apply in a program — L@f,
# L.H@f, L.solve, L.H.solve — instantiates the SAME Mosaic kernel
# (the remote compile helper aborts on programs with two distinct
# large Mosaic kernels; scalar inputs keep the kernel identity unique).
# =========================================================================

def _fa_kernel(s_ref, state_ref, gx_ref, gy_ref, hxx_ref, hxy_ref,
               hyy_ref, dxt_ref, dy_ref, out_ref, *, nsteps, precision,
               fkey=None):
    ddx, ddy = _make_dd_any(dxt_ref[:], dy_ref[:], precision,
                            _fmeta_from_key(fkey) if fkey else None)
    role = s_ref[0]
    t0 = s_ref[1]
    t1 = s_ref[2]
    phi_planes = (gx_ref[:], gy_ref[:], hxx_ref[:], hxy_ref[:], hyy_ref[:])

    adj = role != 0

    def vel(t, y):
        gx, gy, hxx, hxy, hyy = phi_planes
        px, py = _p_of_t(t, gx, gy, hxx, hxy, hyy)
        yc = y[0]
        # forward: p . grad(y)  — multiply AFTER the derivative;
        # adjoint: div(p y)     — multiply BEFORE. One derivative pair
        # either way: the role only selects the multiplication order.
        dx = ddx(jnp.where(adj, px * yc, yc))
        dyv = ddy(jnp.where(adj, py * yc, yc))
        return [jnp.where(adj, dx, px * dx) + jnp.where(adj, dyv, py * dyv)]

    y = _rk4_steps(vel, [state_ref[0]], t0, t1, nsteps)
    out_ref[0] = y[0]


@functools.partial(jax.jit, static_argnums=(3, 4, 7, 8, 9))
def _fa_call(state, phi_planes, mats, kind, nsteps, t0, t1, precision,
             interpret=False, fkey=None):
    """Component-gridded forward/adjoint whole-flow integration.
    state: (ncomp, Ny, Nx); t0/t1 may be traced scalars."""
    ncomp, Ny, Nx = state.shape
    kern = functools.partial(_fa_kernel, nsteps=int(nsteps),
                             precision=precision, fkey=fkey)
    role = jnp.asarray({"forward": 0, "adjoint": 1}[kind], state.dtype)
    svec = jnp.stack([role, jnp.asarray(t0, state.dtype),
                      jnp.asarray(t1, state.dtype)])
    full = lambda: pl.BlockSpec((Ny, Nx), lambda c: (0, 0))
    m0, m1 = mats
    return pl.pallas_call(
        kern,
        grid=(ncomp,),
        out_shape=jax.ShapeDtypeStruct((ncomp, Ny, Nx), state.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, Ny, Nx), lambda c: (c, 0, 0)),
                  full(), full(), full(), full(), full(),
                  pl.BlockSpec(m0.shape, lambda c: (0,) * m0.ndim),
                  pl.BlockSpec(m1.shape, lambda c: (0,) * m1.ndim)],
        out_specs=pl.BlockSpec((1, Ny, Nx), lambda c: (c, 0, 0)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(svec, state, *phi_planes, *mats)


def _fa_fits(Ny, Nx, dtype):
    """Live-plane estimate for the component-gridded fa kernel:
    4 state planes (y/acc/stage/k) + 5 phi planes + ~6 velocity
    transients, all single-component."""
    mats = _plane_mb(Ny, Ny, dtype) + _plane_mb(Nx, Nx, dtype)
    return 15 * _plane_mb(Ny, Nx, dtype) + mats <= _VMEM_BUDGET_MB


# =========================================================================
# per-velocity backward kernel ("bv"): one Mosaic call per backward
# velocity evaluation computing the derivative-heavy pieces — dfdt,
# d(delta_f)/dt and the w = sum_c delta_f_c grad(f_c) planes — with
# the factored dots VMEM-resident. The cheap remaining algebra
# (M^-1 w, the s_ij = t p_j u_i products and the RK4/accumulator
# updates; see models/lenseflow.py::_backward_flow_scan) stays in XLA
# where it fuses into the state updates. The delta_phi accumulation
# itself is hoisted out of the time loop entirely (linearity), so this
# kernel has no second-derivative work at all.
# =========================================================================

def _bv_kernel(s_ref, f_ref, df_ref, gx_ref, gy_ref, hxx_ref, hxy_ref,
               hyy_ref, dxt_ref, dy_ref, out_ref, *, ncomp, precision,
               fkey=None):
    ddx, ddy = _make_dd_any(dxt_ref[:], dy_ref[:], precision,
                            _fmeta_from_key(fkey) if fkey else None)
    t = s_ref[0]
    px, py = _p_of_t(t, gx_ref[:], gy_ref[:], hxx_ref[:], hxy_ref[:],
                     hyy_ref[:])
    wx = None
    wy = None
    for c in range(ncomp):
        fc = f_ref[c]
        dc = df_ref[c]
        fx = ddx(fc)
        fy = ddy(fc)
        out_ref[c] = px * fx + py * fy                       # dfdt
        out_ref[ncomp + c] = ddx(px * dc) + ddy(py * dc)     # ddf
        wx = dc * fx if wx is None else wx + dc * fx
        wy = dc * fy if wy is None else wy + dc * fy
    out_ref[2 * ncomp] = wx
    out_ref[2 * ncomp + 1] = wy


def _bv_call(f, df, phi_planes, precision, interpret=False,
             fkey=None, *, t, mats):
    ncomp, Ny, Nx = f.shape
    kern = functools.partial(_bv_kernel, ncomp=ncomp, precision=precision,
                             fkey=fkey)
    svec = jnp.stack([jnp.asarray(t, f.dtype)])
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * ncomp + 2, Ny, Nx), f.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [vm() for _ in range(9)],
        out_specs=vm(),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(svec, f, df, *phi_planes, *mats)


def _bv_fits(ncomp, Ny, Nx, dtype):
    """Live-plane estimate for the per-velocity backward kernel: in
    (2*ncomp + 5) + out (2*ncomp + 2) + ~8 transients."""
    mats = _plane_mb(Ny, Ny, dtype) + _plane_mb(Nx, Nx, dtype)
    planes = 4 * ncomp + 15
    return planes * _plane_mb(Ny, Nx, dtype) + mats <= 127


def _bv_flow(state, phi_planes, proj, nsteps, t1, t0, precision,
             interpret=False):
    """Backward transpose-delta integration with per-velocity bv
    kernels: mirrors models/lenseflow.py::_backward_flow_scan (U/S
    accumulators hoisted out of the time loop) with the derivative
    bundle of each stage evaluated by _bv_call. state: (2*ncomp+1, Ny,
    Nx) = [f, delta_f, 0]; integrates t1 -> t0; returns the same
    layout [0, delta_f(t0), delta_phi]."""
    from ..ops.deriv import div_plus_dij
    from ..models.lenseflow import _Minv_t

    ncomp = (state.shape[-3] - 1) // 2
    f1 = state[..., :ncomp, :, :]
    dy = state[..., ncomp:2 * ncomp, :, :]
    gx, gy, hxx, hxy, hyy = phi_planes

    fkey = None
    mats = None
    if os.environ.get("CMBL_PALLAS_FACT", "1") != "0":
        fmats, _fm = _fmats_for(proj, state.dtype)
        if fmats is not None:
            mats = fmats
            fkey = (proj.Nx, proj.Ny, float(proj.deltax),
                    str(np.dtype(state.dtype)))
    if mats is None:
        mats = _mats_for(proj, state.dtype)

    h = (t0 - t1) / nsteps

    def integrands(t, f, df):
        out = _bv_call(f, df, phi_planes, precision, interpret,
                       fkey, t=t, mats=mats)
        dfdt = out[:ncomp]
        ddf = out[ncomp:2 * ncomp]
        wx = out[2 * ncomp]
        wy = out[2 * ncomp + 1]
        m11, m12, m22 = _Minv_t(t, (hxx, hxy, hyy))
        ux = m11 * wx + m12 * wy
        uy = m12 * wx + m22 * wy
        # p(t) for the s_ij products (elementwise; fuses into the
        # accumulator updates)
        a = 1.0 + t * hxx
        b = t * hxy
        d = 1.0 + t * hyy
        idet = 1.0 / (a * d - b * b)
        px = (d * gx - b * gy) * idet
        py = (-b * gx + a * gy) * idet
        acc = (ux, uy, t * px * ux, t * py * ux, t * px * uy, t * py * uy)
        return (dfdt, ddf), acc

    zplane = jnp.zeros(state.shape[-2:], state.dtype)
    acc = (zplane,) * 6
    f = f1
    df = dy
    for i in range(int(nsteps)):
        t = t1 + i * h
        k1, a1 = integrands(t, f, df)
        k2, a2 = integrands(t + h / 2, f + (h / 2) * k1[0],
                            df + (h / 2) * k1[1])
        k3, a3 = integrands(t + h / 2, f + (h / 2) * k2[0],
                            df + (h / 2) * k2[1])
        k4, a4 = integrands(t + h, f + h * k3[0], df + h * k3[1])
        f = f + (h / 6) * (k1[0] + 2 * (k2[0] + k3[0]) + k4[0])
        df = df + (h / 6) * (k1[1] + 2 * (k2[1] + k3[1]) + k4[1])
        acc = tuple(x + (h / 6) * (i1 + 2 * (i2 + i3) + i4)
                    for x, i1, i2, i3, i4 in zip(acc, a1, a2, a3, a4))

    dphi = div_plus_dij(acc[0], acc[1], acc[2], acc[3], acc[4], acc[5],
                        proj)[..., None, :, :]
    return jnp.concatenate([jnp.zeros_like(f1), df, dphi], axis=-3)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flow_call(state, phi_planes, mats, kind, nsteps, t0, t1, precision,
               interpret=False, fkey=None):
    """state: (nstate, Ny, Nx); phi_planes: 5-tuple of (Ny, Nx);
    mats: (DxT, Dy) dense or packed factored (with fkey set).
    Integrates t0->t1."""
    nstate, Ny, Nx = state.shape
    ncomp = {"backward": (nstate - 1) // 2}.get(kind, nstate)
    kern = functools.partial(
        _flow_kernel, kind=kind, nstate=nstate, ncomp=ncomp,
        nsteps=nsteps, t0=t0, t1=t1, precision=precision, fkey=fkey)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nstate, Ny, Nx), state.dtype),
        in_specs=[vm() for _ in range(8)],
        out_specs=vm(),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(state, *phi_planes, *mats)


# =========================================================================
# split per-stage kernels (backward only): at sizes where even the
# single fused velocity kernel exceeds the usable VMEM (the Mosaic
# matmul staging overhead caps usable VMEM well below the 128MB raw
# capacity at 1024^2), the velocity is computed as 2*ncomp+1 smaller
# kernels with the cheap elementwise glue (p(t), M^-1(t), u = M^-1 w)
# left to XLA. Matmuls stay fused with their adjacent elementwise work;
# only ~50MB/stage of elementwise traffic rides HBM.
# =========================================================================

def _bwdAB_kernel(s_ref, a_ref, b_ref, px_ref, py_ref, dxt_ref, dy_ref,
                  out_ref, *, precision, fkey=None):
    """Role-switched UNIVERSAL velocity kernel. The axon remote compile
    helper aborts on XLA programs containing two *distinct* Mosaic
    kernels at 1024^2 (many instances of ONE kernel are fine — the
    stage-kernel scan compiles), and production programs mix flows (CG
    = forward+adjoint applies; gradlnP = forward+backward) — so above
    the whole-flow size every velocity evaluation of every flow is a
    call of THIS kernel, with a scalar `role` selecting the math:

    role 0 (bwd A): a=f_c, b=df_c -> out [dfdt, ddf, wx_c, wy_c]
    role 1 (bwd B): a=ux,  b=uy   -> out [ddphi, 0, 0, 0] (s[0] = t)
    role 2 (forward): a,b = two components -> out [v(a), v(b), 0, 0]
                      with v(x) = p . grad x
    role 3 (adjoint): same, with v(x) = div(p x)
    """
    ddx, ddy = _make_dd_any(dxt_ref[:], dy_ref[:], precision,
                            _fmeta_from_key(fkey) if fkey else None)
    t = s_ref[0]
    role = s_ref[1]
    px = px_ref[:]
    py = py_ref[:]
    a = a_ref[:]
    b = b_ref[:]

    @pl.when(role == 0)
    def _():
        fx = ddx(a)
        fy = ddy(a)
        out_ref[0] = px * fx + py * fy
        out_ref[1] = ddx(px * b) + ddy(py * b)
        out_ref[2] = b * fx
        out_ref[3] = b * fy

    @pl.when(role == 1)
    def _():
        out_ref[0] = (ddx(a + ddx(t * px * a) + ddy(t * py * a))
                      + ddy(b + ddx(t * px * b) + ddy(t * py * b)))
        zero = jnp.zeros_like(a)
        out_ref[1] = zero
        out_ref[2] = zero
        out_ref[3] = zero

    @pl.when(role == 2)
    def _():
        out_ref[0] = px * ddx(a) + py * ddy(a)
        out_ref[1] = px * ddx(b) + py * ddy(b)
        zero = jnp.zeros_like(a)
        out_ref[2] = zero
        out_ref[3] = zero

    @pl.when(role == 3)
    def _():
        out_ref[0] = ddx(px * a) + ddy(py * a)
        out_ref[1] = ddx(px * b) + ddy(py * b)
        zero = jnp.zeros_like(a)
        out_ref[2] = zero
        out_ref[3] = zero


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _uni_call(state, phi_planes, mats, kind, nsteps, t0, t1, precision,
              interpret=False, fkey=None):
    """RK4 integration with every velocity evaluation expressed as
    calls of the single universal kernel (roles 0-3)."""
    nstate, Ny, Nx = state.shape
    ncomp = {"backward": (nstate - 1) // 2}.get(kind, nstate)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    callU = pl.pallas_call(
        functools.partial(_bwdAB_kernel, precision=precision, fkey=fkey),
        out_shape=jax.ShapeDtypeStruct((4, Ny, Nx), state.dtype),
        in_specs=[smem] + [vm() for _ in range(6)],
        out_specs=vm(),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )
    gx, gy, hxx, hxy, hyy = phi_planes
    DxT, Dy = mats

    def s_vec(t, role):
        tv = (t.astype(state.dtype) if hasattr(t, "astype")
              else jnp.asarray(t, state.dtype))
        return jnp.stack([tv, jnp.asarray(role, state.dtype)])

    def vel(t, y):
        px, py = _p_of_t(t, gx, gy, hxx, hxy, hyy)       # XLA elementwise
        if kind in ("forward", "adjoint"):
            role = 2 if kind == "forward" else 3
            outs = []
            for c0 in range(0, nstate, 2):
                c1 = min(c0 + 1, nstate - 1)
                o = callU(s_vec(t, role), y[c0], y[c1], px, py, DxT, Dy)
                outs.append(o[0])
                if c1 > c0:
                    outs.append(o[1])
            return jnp.stack(outs)
        m11, m12, m22 = _minv_of_t(t, hxx, hxy, hyy)
        outs = [callU(s_vec(t, 0), y[c], y[ncomp + c], px, py, DxT, Dy)
                for c in range(ncomp)]
        wx = sum(o[2] for o in outs)
        wy = sum(o[3] for o in outs)
        ux = m11 * wx + m12 * wy
        uy = m12 * wx + m22 * wy
        if _SPLIT_DPHI_BACKEND == "xla":
            # delta-phi term as plain XLA matmuls (same 6-matmul
            # regrouping; guarantees a single Mosaic kernel type in
            # the program)
            xddx, xddy = _make_dd_any(DxT, Dy, precision,
                                      _fmeta_from_key(fkey) if fkey else None)
            ddphi = (xddx(ux + xddx(t * px * ux) + xddy(t * py * ux))
                     + xddy(uy + xddx(t * px * uy) + xddy(t * py * uy)))[None]
        else:
            ddphi = callU(s_vec(t, 1), ux, uy, px, py, DxT, Dy)[:1]
        return jnp.concatenate([jnp.stack([o[0] for o in outs]),
                                jnp.stack([o[1] for o in outs]),
                                ddphi], axis=0)

    h = (t1 - t0) / nsteps

    def step(y, i):
        t = t0 + i * h
        k1 = vel(t, y)
        k2 = vel(t + h / 2, y + (h / 2) * k1)
        k3 = vel(t + h / 2, y + (h / 2) * k2)
        k4 = vel(t + h, y + h * k3)
        return y + (h / 6) * (k1 + 2 * (k2 + k3) + k4), None

    y, _ = jax.lax.scan(step, state, jnp.arange(nsteps, dtype=state.dtype))
    return y


# kept under its historical name for tests
_split_call = _uni_call


def _split_fits(kind, nstate, Ny, Nx, dtype):
    """Universal-kernel path: its largest instantiation holds ~13
    planes + the two derivative matrices."""
    mats = _plane_mb(Ny, Ny, dtype) + _plane_mb(Nx, Nx, dtype)
    return 13 * _plane_mb(Ny, Nx, dtype) + mats <= _VMEM_BUDGET_MB


_uni_fits = _split_fits


# =========================================================================
# public entry points (batched: leading dims vmapped)
# =========================================================================

def flow_available(kind, nstate, Ny, Nx, dtype=np.float32):
    """True when requesting the pallas backend will actually run fused
    kernels (so an explicit 'pallas' request matches what executes —
    the uni path only engages under CMBL_FORCE_UNI). Above the
    whole-flow size the component-gridded fa kernel still covers
    forward/adjoint applies (the backward flow lowers to the optimized
    scan there)."""
    if not _HAS_PALLAS:
        return False
    if _flow_fits("backward", nstate, Ny, Nx, dtype):
        return True
    if _fa_fits(Ny, Nx, dtype) and not os.environ.get("CMBL_NO_FA"):
        return True
    return bool(os.environ.get("CMBL_FORCE_UNI")) and _uni_fits(
        kind, nstate, Ny, Nx, dtype)


def _run_flow(state, phi_planes, proj, kind, nsteps, t0, t1, precision,
              interpret=False):
    """state: (..., nstate, Ny, Nx); phi_planes (gx,gy,hxx,hxy,hyy)
    each (..., Ny, Nx). Chooses whole-flow vs per-stage granularity.

    Unless interpret=True (test-only: run the kernel logic through the
    pallas interpreter on any backend), the call is staged through
    jax.lax.platform_dependent: the native Mosaic kernel lowers only
    for TPU targets, every other platform gets the identical lax.scan
    integrator — so the 'pallas' backend is safe inside jit regardless
    of where the trace eventually executes."""
    assert _HAS_PALLAS
    nstate, Ny, Nx = state.shape[-3:]
    # factored in-kernel derivatives whenever the radix pays (same
    # operator at f32 parity, ~2.7x fewer MXU MACs at 1024^2 and
    # 4x smaller in-VMEM matrices); CMBL_PALLAS_FACT=0 restores dense
    fkey = None
    mats = None
    if os.environ.get("CMBL_PALLAS_FACT", "1") != "0":
        fmats, _fm = _fmats_for(proj, state.dtype)
        if fmats is not None:
            mats = fmats
            fkey = (proj.Nx, proj.Ny, float(proj.deltax),
                    str(np.dtype(state.dtype)))
    if mats is None:
        mats = _mats_for(proj, state.dtype)
    # batched or vmapped flows (MAP line searches vmap 16 alphas; MUSE
    # batches whole sim ensembles): a vmapped pallas_call runs as a
    # sequential grid while the scan path becomes big batched GEMMs
    # that the MXU crunches at far better utilization — measured 256^2
    # single-dataset MAP step 246ms with fused kernels vs 127ms scan.
    # Fused kernels are for single-instance flows only.
    if state.shape[:-3] or _is_vmapped(state):
        return _scan_fallback(state, phi_planes, proj, kind,
                              int(nsteps), t0, t1)
    # Measured policy (1024^2, f32-HIGHEST, v5e): outside the
    # VMEM-resident whole-flow regime, XLA's tuned matmul emitters beat
    # per-velocity Mosaic kernels for EVERY flow — forward scan 9.9ms
    # vs uni 14.4ms; per backward flow scan ~27ms vs uni 39.8ms; full
    # gradlnP scan 78.9ms vs 108.8ms mixed — so fused kernels are used
    # ONLY when the whole backward integration fits VMEM (binding
    # constraint nstate=2*ncomp+1; <=~512^2, where fusion wins: 256^2
    # backward 0.53ms fused vs 0.80ms scan). Above that the pallas
    # backend degenerates to the identical scan integrator. The uni
    # kernels remain available (tests; CMBL_FORCE_UNI=1) for future
    # toolchains where Mosaic matmul throughput closes the gap.
    ncomp = {"backward": (nstate - 1) // 2}.get(kind, nstate)
    nstate_max = 2 * ncomp + 1
    if _flow_fits("backward", nstate_max, Ny, Nx, state.dtype):
        call = _flow_call
    elif (kind in ("forward", "adjoint")
          and _fa_fits(Ny, Nx, state.dtype)
          and not os.environ.get("CMBL_NO_FA")):
        # above the whole-flow size: forward/adjoint applies still run
        # VMEM-resident via the component-gridded fa kernel (backward
        # goes per-velocity via the bv kernel below, or the scan)
        call = _fa_call
    elif (kind == "backward" and _bv_fits(ncomp, Ny, Nx, state.dtype)
          and os.environ.get("CMBL_FORCE_BV")):
        # measured at 1024^2 f32: gradlnP 44.2ms via bv vs 43.1ms via
        # the structured scan — the kernel boundary breaks XLA's
        # elementwise-into-matmul fusion, so bv stays opt-in (kept,
        # like uni, for future toolchains)
        fn = lambda s, pp: _bv_flow(s, pp, proj, int(nsteps), float(t0),
                                    float(t1), precision, interpret)
        if interpret:
            return fn(state, phi_planes)
        return jax.lax.platform_dependent(
            tpu=lambda: fn(state, phi_planes),
            default=lambda: _scan_fallback(state, phi_planes, proj, kind,
                                           nsteps, t0, t1))
    elif os.environ.get("CMBL_FORCE_FLOW") and _flow_fits(
            kind, nstate, Ny, Nx, state.dtype):
        # probe/expert mode: whole-flow kernel for THIS kind even when
        # the backward flow wouldn't fit (mixing granularities in one
        # program risks the two-distinct-kernels compile-helper abort)
        call = _flow_call
    elif os.environ.get("CMBL_FORCE_UNI") and _uni_fits(
            kind, nstate, Ny, Nx, state.dtype):
        call = _uni_call
    else:
        return _scan_fallback(state, phi_planes, proj, kind,
                              int(nsteps), t0, t1)
    fn = lambda s, pp: call(s, pp, mats, kind, int(nsteps),
                            float(t0), float(t1), precision, interpret,
                            fkey)
    batch = state.shape[:-3]
    for _ in batch:
        fn = jax.vmap(fn)
    if interpret:
        return fn(state, phi_planes)
    return jax.lax.platform_dependent(
        tpu=lambda: fn(state, phi_planes),
        default=lambda: _scan_fallback(state, phi_planes, proj, kind,
                                       nsteps, t0, t1))


def pallas_flow_apply(f_map, g, h, t0, t1, nsteps, proj, kind="forward",
                      precision="f32", interpret=False):
    """Integrate the forward or adjoint LenseFlow from t0 to t1.
    f_map: (..., ncomp, Ny, Nx); g=(gx,gy), h=(hxx,hxy,hyy) map planes
    broadcastable to (..., Ny, Nx)."""
    batch = jnp.broadcast_shapes(f_map.shape[:-3], g[0].shape[:-2])
    f_map = jnp.broadcast_to(f_map, batch + f_map.shape[-3:])
    phi_planes = tuple(jnp.broadcast_to(p, batch + p.shape[-2:])
                       for p in (*g, *h))
    return _run_flow(f_map, phi_planes, proj, kind, nsteps, t0, t1, precision,
                     interpret)


def pallas_flow_bwd(dy, f1, g, h, t0, t1, nsteps, proj, precision="f32",
                    interpret=False):
    """Integrate the coupled (f, delta_f, delta_phi) transpose-delta
    system from t1 back to t0 starting at (f1, dy, 0); returns
    (dphi, df0). Mirrors models/lenseflow.py::_lenseflow_bwd."""
    ncomp = f1.shape[-3]
    batch = jnp.broadcast_shapes(f1.shape[:-3], dy.shape[:-3],
                                 g[0].shape[:-2])
    f1 = jnp.broadcast_to(f1, batch + f1.shape[-3:])
    dy = jnp.broadcast_to(dy, batch + dy.shape[-3:])
    dphi0 = jnp.zeros(batch + (1,) + f1.shape[-2:], f1.dtype)
    state = jnp.concatenate([f1, dy, dphi0], axis=-3)
    phi_planes = tuple(jnp.broadcast_to(p, batch + p.shape[-2:])
                       for p in (*g, *h))
    out = _run_flow(state, phi_planes, proj, "backward", nsteps, t1, t0,
                    precision, interpret)
    df0 = out[..., ncomp:2 * ncomp, :, :]
    dphi = out[..., 2 * ncomp:, :, :]
    return dphi, df0


# --- legacy wrappers kept for the existing tests ---------------------------

def pallas_lenseflow_apply(f_map, g, h, t0, t1, nsteps, proj):
    return pallas_flow_apply(f_map, g, h, t0, t1, nsteps, proj,
                             kind="forward")


def lenseflow_apply_fused(phi_map, f_map, t0, t1, nsteps, proj):
    """Compute grad/Hess(phi) then run the fused forward kernel; falls
    back to the lax.scan implementation if Pallas is unavailable."""
    from ..models.lenseflow import _gradhess_phi, _rk4, _velocity
    g, h = _gradhess_phi(phi_map, proj)
    if not _HAS_PALLAS:
        return _rk4(lambda t, y: _velocity(t, y, g, h, proj), f_map, t0, t1, nsteps)
    return pallas_flow_apply(f_map, g, h, float(t0), float(t1), int(nsteps), proj)
