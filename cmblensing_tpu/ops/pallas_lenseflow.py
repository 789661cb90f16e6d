"""Fully-fused LenseFlow forward integration as a single Pallas TPU
kernel.

The velocity of the LenseFlow ODE is (SURVEY.md section 3.2):

    v(t, f) = p(t) . grad f,   p(t) = (I + t Hess(phi))^-T grad(phi)

With spectral derivatives expressed as real circulant matmuls
(ops/deriv.py), one RK4 integration is ~(4 stages x nsteps x ncomp x 2)
matmuls plus elementwise work. XLA runs these as separate HBM-level
ops; this kernel keeps the ODE state, the derivative matrices and
grad/Hess(phi) resident in VMEM for the *entire* integration — zero
HBM traffic between stages — and feeds the MXU back-to-back.

Fits comfortably in VMEM for maps up to 512^2 (f32): state+scratch
~12 planes + two NxN derivative matrices.
"""
from __future__ import annotations

import functools

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


def _kernel(f_ref, gx_ref, gy_ref, hxx_ref, hxy_ref, hyy_ref,
            dxt_ref, dy_ref, out_ref, *, nsteps, t0, t1, ncomp):
    h = (t1 - t0) / nsteps
    gx = gx_ref[:]
    gy = gy_ref[:]
    hxx = hxx_ref[:]
    hxy = hxy_ref[:]
    hyy = hyy_ref[:]
    DxT = dxt_ref[:]
    Dy = dy_ref[:]

    def p_of_t(t):
        a = 1.0 + t * hxx
        b = t * hxy
        d = 1.0 + t * hyy
        idet = 1.0 / (a * d - b * b)
        px = (d * gx - b * gy) * idet
        py = (-b * gx + a * gy) * idet
        return px, py

    def vel(t, y):
        px, py = p_of_t(t)
        out = []
        for c in range(ncomp):
            yc = y[c]
            fx = jnp.dot(yc, DxT, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            fy = jnp.dot(Dy, yc, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            out.append(px * fx + py * fy)
        return out

    y = [f_ref[c] for c in range(ncomp)]
    for i in range(nsteps):
        t = t0 + i * h
        k1 = vel(t, y)
        k2 = vel(t + h / 2, [y[c] + (h / 2) * k1[c] for c in range(ncomp)])
        k3 = vel(t + h / 2, [y[c] + (h / 2) * k2[c] for c in range(ncomp)])
        k4 = vel(t + h, [y[c] + h * k3[c] for c in range(ncomp)])
        y = [y[c] + (h / 6) * (k1[c] + 2 * (k2[c] + k3[c]) + k4[c])
             for c in range(ncomp)]
    for c in range(ncomp):
        out_ref[c] = y[c]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def pallas_lenseflow_apply(f_map, g, h, t0, t1, nsteps, proj):
    """Integrate the LenseFlow ODE with the fused kernel.

    f_map: (ncomp, Ny, Nx); g=(gx,gy); h=(hxx,hxy,hyy) map planes.
    No batch axis (vmap externally if needed)."""
    assert _HAS_PALLAS
    ncomp, Ny, Nx = f_map.shape
    # VMEM budget: ~(5 + 2*ncomp*6) planes + 2 derivative matrices must
    # stay under ~16MB; 512^2 f32 is the practical ceiling
    vmem_bytes = 4 * (Ny * Nx * (5 + ncomp * 7) + Ny * Ny + Nx * Nx)
    if vmem_bytes > 14 * 1024 * 1024:
        raise ValueError(
            f"map too large for the fused VMEM-resident kernel "
            f"(~{vmem_bytes/2**20:.0f}MB needed); use the lax.scan path")
    dt = f_map.dtype
    Dx1, _ = _deriv_matrices(Nx, float(proj.deltax), str(np.dtype(dt)))
    Dy1, _ = _deriv_matrices(Ny, float(proj.deltax), str(np.dtype(dt)))
    DxT = jnp.asarray(Dx1.T.copy())
    Dy = jnp.asarray(Dy1)
    gx, gy = g
    hxx, hxy, hyy = h

    kern = functools.partial(_kernel, nsteps=nsteps, t0=t0, t1=t1, ncomp=ncomp)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncomp, Ny, Nx), dt),
        in_specs=[vm() for _ in range(8)],
        out_specs=vm(),
    )(f_map, gx, gy, hxx, hxy, hyy, DxT, Dy)


def lenseflow_apply_fused(phi_map, f_map, t0, t1, nsteps, proj):
    """Convenience wrapper computing grad/Hess(phi) then running the
    fused kernel. Falls back to the lax.scan implementation if Pallas
    is unavailable."""
    from ..models.lenseflow import _gradhess_phi, _rk4, _velocity
    g, h = _gradhess_phi(phi_map, proj)
    if not _HAS_PALLAS:
        return _rk4(lambda t, y: _velocity(t, y, g, h, proj), f_map, t0, t1, nsteps)
    return pallas_lenseflow_apply(f_map, g, h, float(t0), float(t1), int(nsteps), proj)
