"""Binned power-spectrum estimation (reference get_Cℓ,
src/proj_lambert.jl:470-513). Host-side numpy post-processing."""
from __future__ import annotations

import numpy as np

from ..core.field import Field
from ..core.basis import FOURIER
from ..utils.cls import Cls
from ..ops.fft import unfold


def _full_plane_lmag(proj):
    ly = np.fft.ifftshift(np.arange(-(proj.Ny // 2), (proj.Ny - 1) // 2 + 1)) * float(proj.delta_ly)
    lx = np.fft.ifftshift(np.arange(-(proj.Nx // 2), (proj.Nx - 1) // 2 + 1)) * float(proj.delta_lx)
    return np.sqrt(lx[None, :] ** 2 + ly[:, None] ** 2)


def _spin0_fourier_full(f: Field):
    # Spectra are host-side post-processing: fetch to host FIRST
    # (complex-safe — tunneled TPU attachments cannot transfer complex
    # arrays, utils/transfer.py) and run the transform + unfold on the
    # CPU backend. Leaving them to the default device re-dispatches the
    # numpy inputs to the TPU attachment, where the unfold slicing is
    # Unimplemented at large N (observed at 4096^2).
    import jax
    from .transfer import device_get_safe
    cpu = jax.devices("cpu")[0]
    f = device_get_safe(f)
    with jax.default_device(cpu):
        g = f.to(FOURIER) if f.basis.pol == "I" else f
        arr = np.asarray(jax.device_get(g.arr))
        assert arr.shape[-3] == 1
        # Nx must be passed explicitly: the even-grid inference 2*(Nxh-1)
        # silently yields an (Ny, Nx-1) plane on odd-Nx grids
        return np.asarray(jax.device_get(unfold(arr[..., 0, :, :], Nx=f.proj.Nx)))


def get_Cl(f1: Field, f2: Field = None, dl=50, ledges=None, Clfid=None, err_estimate=False):
    """Binned (cross-)power spectrum of spin-0 fields, or per-component
    spectra of spin-2/spin-(0,2) fields (which='EE' etc. handled by the
    component indexing on Fields)."""
    if f2 is None:
        f2 = f1
    if f1.basis.ncomp > 1:
        raise ValueError("index components first, e.g. get_Cl(f['E'])")
    proj = f1.proj
    if ledges is None:
        ledges = np.arange(0, 16001, dl)
    ledges = np.asarray(ledges, dtype=np.float64)

    lmag = _full_plane_lmag(proj)
    alpha = proj.Nx * proj.Ny / float(proj.deltax) ** 2

    F1 = _spin0_fourier_full(f1)
    F2 = _spin0_fourier_full(f2)
    if F1.ndim > 2:
        F1 = F1.reshape((-1,) + F1.shape[-2:])[0]
        F2 = F2.reshape((-1,) + F2.shape[-2:])[0]

    mask = (lmag > ledges.min()) & (lmag < ledges.max())
    L = lmag[mask]
    CLobs = np.real(np.conj(F1[mask]) * F2[mask]) / alpha
    if Clfid is None:
        w = np.nan_to_num((2 * 1.0 ** 2 / (2 * L + 1)) ** -1)
    else:
        w = np.nan_to_num((2 * Clfid(L) ** 2 / (2 * L + 1)) ** -1)

    def bin_sum(x):
        return np.histogram(L, bins=ledges, weights=x)[0]

    A = bin_sum(w)
    Clb = bin_sum(w * CLobs)
    lb = bin_sum(w * L)

    with np.errstate(invalid="ignore", divide="ignore"):
        if err_estimate:
            N = bin_sum(np.ones_like(w)) / 2
            Cl2 = bin_sum(w * CLobs ** 2)
            sigma = np.sqrt((Cl2 / A - (Clb / A) ** 2) / N)
            return Cls(lb / A, Clb / A), sigma
        return Cls(lb / A, Clb / A)


def get_Dl(*args, **kwargs):
    """Binned spectrum in the package-wide Dl = ell(ell+1)Cl/2pi
    convention (matching toDl in utils/cls.py and plot_cls)."""
    cl = get_Cl(*args, **kwargs)
    return Cls(cl.ell, cl.ell * (cl.ell + 1) * cl.Cl / (2 * np.pi))
