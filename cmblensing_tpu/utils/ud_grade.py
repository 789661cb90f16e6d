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
    else:  # upgrade (proj is the coarse grid, proj_new the fine one)
        if mode == "map":
            fm = f.to(B.with_space("map"))
            a = jnp.repeat(jnp.repeat(fm.arr, fac, axis=-2), fac, axis=-1)
            out = Field(a, B.with_space("map"), proj_new)
        else:
            # Fourier zero-pad (trigonometric interpolation). The old
            # Nyquist row/column is a single self-paired bin; split it
            # with half weight into its +/- positions on the fine grid
            # so the interpolated map stays real. Round trips
            # down(up(f)) are exact for Nyquist-free content. The
            # reference leaves this path unimplemented
            # (proj_lambert.jl:585-590).
            ff = f.to(B.with_space("fourier"))
            a = ff.arr * (fac * fac)
            ncol = proj.Nx // 2 + 1
            if proj.Nx % 2 == 0:
                a = a.at[..., :, proj.Nx // 2].multiply(0.5)
            pos = (proj.Ny + 1) // 2   # rows 0..pos-1 are freqs 0..
            neg = proj.Ny - pos        # rows pos.. are freqs -neg..-1
            z = jnp.zeros(ff.arr.shape[:-2] + (Ny_new, Nx_new // 2 + 1),
                          dtype=ff.arr.dtype)
            if proj.Ny % 2 == 0:
                a = a.at[..., pos, :].multiply(0.5)
                # other half of the old +/-Ny/2 bin goes to +Ny/2
                z = z.at[..., proj.Ny // 2, :ncol].set(a[..., pos, :])
            z = z.at[..., :pos, :ncol].set(a[..., :pos, :])
            z = z.at[..., Ny_new - neg:, :ncol].set(a[..., pos:, :])
            out = Field(z, B.with_space("fourier"), proj_new)
        if anti_aliasing and mode == "map":
            # kill pixel-replication aliases above the coarse Nyquist
            of = out.to(B.with_space("fourier"))
            keep = ((np.abs(np.asarray(proj_new.ly))[:, None] < float(proj.nyquist)) &
                    (np.abs(np.asarray(proj_new.lx))[None, :] < float(proj.nyquist)))
            out = Field(of.arr * jnp.asarray(keep.astype(proj.T)), of.basis,
                        proj_new)
        if deconv_pixwin:
            # remove the resampling transfer pw(coarse)/pw(fine) so the
            # fine map's spectrum matches the input's; only defined
            # below the coarse Nyquist (identity above)
            band = ((np.abs(np.asarray(proj_new.ly))[:, None] < float(proj.nyquist)) &
                    (np.abs(np.asarray(proj_new.lx))[None, :] < float(proj.nyquist)))
            ratio = _pixwin_2d(theta_new, proj_new) / _pixwin_2d(theta, proj_new)
            pw = np.where(band, ratio, 1.0).astype(proj.T)
            of = out.to(B.with_space("fourier"))
            out = Field(of.arr * jnp.asarray(pw), of.basis, proj_new)
        return out.to(B)
