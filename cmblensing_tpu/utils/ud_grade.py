"""Resolution up/downgrading of fields (reference ud_grade,
src/proj_lambert.jl:533-592)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.field import Field
from ..core.basis import Basis
from ..core.proj import ProjLambert, pixwin
from ..core.ops import Diag


def _pixwin_2d(theta, proj):
    wy = pixwin(theta, np.asarray(proj.ly, dtype=np.float64))
    wx = pixwin(theta, np.asarray(proj.lx, dtype=np.float64))
    return wy[:, None] * wx[None, :]


def ud_grade(f: Field, theta_new, mode="map", deconv_pixwin=None, anti_aliasing=None):
    """Up/downgrade f to resolution theta_new (integer steps only).

    mode='map':     replicate/average pixels in map space
    mode='fourier': extend/truncate the Fourier grid
    """
    if deconv_pixwin is None:
        deconv_pixwin = mode == "map"
    if anti_aliasing is None:
        anti_aliasing = mode == "map"
    proj = f.proj
    theta = proj.thetapix
    if theta_new == theta:
        return f
    if mode not in ("map", "fourier"):
        raise ValueError("mode must be 'map' or 'fourier'")

    fac = theta_new / theta if theta_new > theta else theta / theta_new
    if abs(round(fac) - fac) > 1e-9:
        raise ValueError("can only ud_grade in integer steps")
    fac = int(round(fac))
    Ny_new = int(round(proj.Ny * theta / theta_new))
    Nx_new = int(round(proj.Nx * theta / theta_new))
    proj_new = ProjLambert(Ny_new, Nx_new, theta_new, T=proj.T, rotator=proj.rotator)
    B = f.basis

    if theta_new > theta:  # downgrade
        if anti_aliasing:
            ff = f.to(B.with_space("fourier"))
            keep = ((np.abs(np.asarray(proj.ly))[:, None] < float(proj_new.nyquist)) &
                    (np.abs(np.asarray(proj.lx))[None, :] < float(proj_new.nyquist)))
            f = Field(ff.arr * jnp.asarray(keep.astype(proj.T)), ff.basis, proj)
        if mode == "map":
            fm = f.to(B.with_space("map"))
            a = fm.arr
            sh = a.shape[:-2] + (Ny_new, fac, Nx_new, fac)
            a = a.reshape(sh).mean(axis=(-1, -3))
            out = Field(a, B.with_space("map"), proj_new)
        else:
            ff = f.to(B.with_space("fourier"))
            a = ff.arr
            ysel = np.concatenate([np.arange(0, (Ny_new + 1) // 2),
                                   np.arange(proj.Ny - Ny_new // 2, proj.Ny)])
            a = a[..., ysel, : Nx_new // 2 + 1] / (fac * fac)
            out = Field(a, B.with_space("fourier"), proj_new)
        if deconv_pixwin:
            pw = (_pixwin_2d(theta_new, proj_new) / _pixwin_2d(theta, proj_new)).astype(proj.T)
            of = out.to(B.with_space("fourier"))
            out = Field(of.arr / jnp.asarray(pw), of.basis, proj_new)
        return out.to(B)
    else:  # upgrade
        if mode == "map":
            fm = f.to(B.with_space("map"))
            a = fm.arr
            a = jnp.repeat(jnp.repeat(a, fac, axis=-2), fac, axis=-1)
            if deconv_pixwin:
                raise NotImplementedError("deconv_pixwin upgrade not implemented")
            return Field(a, B.with_space("map"), proj_new).to(B)
        raise NotImplementedError("fourier-mode upgrade not implemented")
