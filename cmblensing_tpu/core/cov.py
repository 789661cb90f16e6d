"""Building covariance operators from angular power spectra.

TPU-native analog of Cℓ_to_Cov (src/proj_lambert.jl:361-411): a
covariance diagonal in 2-D Fourier space is Cl(|l|)/Omega_pix, built
host-side in numpy (setup-time) and stored as device constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .basis import Basis, FOURIER, EB_FOURIER, IEB_FOURIER
from .field import Field
from .ops import Diag, BlockDiagIEB, ParamDependentOp, nan2zero
from .proj import ProjLambert
from ..utils.cls import Cls


def Cl_to_2D(Cl, proj: ProjLambert):
    """Evaluate a 1-D spectrum on the 2-D |l| grid, NaN->0
    (src/proj_lambert.jl:173-175)."""
    v = Cl(np.asarray(proj.lmag, dtype=np.float64))
    v = np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
    return v.astype(proj.T)


def _fourier_field(arrs, proj, pol):
    arr = np.stack(arrs, axis=0)
    return Field(jnp.asarray(arr, dtype=proj.T.type), Basis(pol, "fourier"), proj)


def Cl_to_Cov(pol, proj: ProjLambert, *Cl, units=None):
    """Build a Fourier-diagonal covariance operator.

    pol='I':  Cl_to_Cov('I', proj, ClTT)
    pol='P':  Cl_to_Cov('P', proj, ClEE, ClBB)          -> Diag on EB
    pol='IP': Cl_to_Cov('IP', proj, ClTT, ClEE, ClBB, ClTE) -> BlockDiagIEB

    Any spectrum may instead be a tuple (Cl, ledges, name) to produce a
    bandpower-rescalable ParamDependentOp (src/proj_lambert.jl:374-402).
    units defaults to Omega_pix (covariance of *pixel-unit* maps).
    """
    if units is None:
        units = float(proj.Omega_pix)
    pol = str(pol)

    has_banded = any(isinstance(c, tuple) for c in Cl)
    if not has_banded:
        return _cl_to_cov_fixed(pol, proj, Cl, units)
    # only these banded patterns are implemented (which spectra carry a
    # (Cl, ledges, name) tuple); anything else used to fail later with
    # a baffling unpack error
    supported = {"I": (True,), "P": (True, False),
                 "IP": (True, True, False, True)}
    banded = tuple(isinstance(c, tuple) for c in Cl)
    if banded != supported.get(pol):
        raise NotImplementedError(
            f"banded Cl_to_Cov('{pol}') supports tuple spectra in the "
            f"pattern {supported.get(pol)} (True = (Cl, ledges, name)); "
            f"got {banded}")
    return _cl_to_cov_banded(pol, proj, Cl, units)


def _cl_to_cov_fixed(pol, proj, Cl, units):
    if pol == "I":
        (ClTT,) = Cl
        return Diag(_fourier_field([Cl_to_2D(ClTT, proj) / units], proj, "I"))
    if pol == "P":
        ClEE, ClBB = Cl
        return Diag(_fourier_field(
            [Cl_to_2D(ClEE, proj) / units, Cl_to_2D(ClBB, proj) / units], proj, "EB"))
    if pol == "IP":
        ClTT, ClEE, ClBB, ClTE = Cl
        F = lambda c: _fourier_field([Cl_to_2D(c, proj) / units], proj, "I")
        return BlockDiagIEB(F(ClTT), F(ClTE), F(ClEE), F(ClBB))
    raise ValueError(pol)


def _find_bins(ledges, lmag):
    """Bin index of each |l| grid entry; out-of-range -> nbins
    (reference findbin, src/proj_lambert.jl:405-407)."""
    ledges = np.asarray(ledges, dtype=np.float64)
    idx = np.searchsorted(ledges, np.asarray(lmag, dtype=np.float64), side="right") - 1
    nbins = len(ledges) - 1
    idx = np.where((lmag < ledges[0]) | (lmag >= ledges[-1]), nbins, idx)
    return idx.astype(np.int32)


def _bandpower_rescale(arr0, bin_idx, amplitudes):
    """Rescale a 2-D covariance array by per-bin amplitudes (with an
    implicit trailing amplitude 1 for out-of-range)."""
    amps = jnp.concatenate([jnp.atleast_1d(amplitudes), jnp.ones(1, dtype=amplitudes.dtype)])
    return amps[bin_idx] * arr0


def _cl_to_cov_banded(pol, proj, Cl, units):
    if pol == "I":
        ((Cl0, ledges, name),) = Cl
        C0 = _cl_to_cov_fixed("I", proj, (Cl0,), units)
        bins = jnp.asarray(_find_bins(ledges, proj.lmag))
        nbins = len(ledges) - 1

        def fn(deps, **theta):
            (C0,) = deps
            amps = jnp.asarray(theta.get(name, np.ones(nbins)), dtype=proj.T.type)
            return Diag(Field(_bandpower_rescale(C0.diag.arr, bins[None], amps),
                              FOURIER, proj))

        return ParamDependentOp((name,), fn, (C0,))

    if pol == "P":
        (ClEE, ledges, name), ClBB = Cl
        C0 = _cl_to_cov_fixed("P", proj, (ClEE, ClBB), units)
        bins = jnp.asarray(_find_bins(ledges, proj.lmag))
        nbins = len(ledges) - 1

        def fn(deps, **theta):
            (C0,) = deps
            amps = jnp.asarray(theta.get(name, np.ones(nbins)), dtype=proj.T.type)
            E = _bandpower_rescale(C0.diag.arr[..., 0:1, :, :], bins[None], amps)
            B = C0.diag.arr[..., 1:2, :, :]
            return Diag(Field(jnp.concatenate([E, B], axis=-3), EB_FOURIER, proj))

        return ParamDependentOp((name,), fn, (C0,))

    if pol == "IP":
        (ClTT, eTT, nTT), (ClEE, eEE, nEE), ClBB, (ClTE, eTE, nTE) = Cl
        C0 = _cl_to_cov_fixed("IP", proj, (ClTT, ClEE, ClBB, ClTE), units)
        binsTT = jnp.asarray(_find_bins(eTT, proj.lmag))
        binsEE = jnp.asarray(_find_bins(eEE, proj.lmag))
        binsTE = jnp.asarray(_find_bins(eTE, proj.lmag))
        nb = {nTT: len(eTT) - 1, nEE: len(eEE) - 1, nTE: len(eTE) - 1}

        def fn(deps, **theta):
            (C0,) = deps
            aTT = jnp.asarray(theta.get(nTT, np.ones(nb[nTT])), dtype=proj.T.type)
            aEE = jnp.asarray(theta.get(nEE, np.ones(nb[nEE])), dtype=proj.T.type)
            aTE = jnp.asarray(theta.get(nTE, np.ones(nb[nTE])), dtype=proj.T.type)
            F = lambda a: Field(a, FOURIER, proj)
            return BlockDiagIEB(
                F(_bandpower_rescale(C0.TT.arr, binsTT[None], aTT)),
                F(_bandpower_rescale(C0.TE.arr, binsTE[None], aTE)),
                F(_bandpower_rescale(C0.EE.arr, binsEE[None], aEE)),
                C0.BB)

        return ParamDependentOp((nTT, nEE, nTE), fn, (C0,))

    raise ValueError(pol)


def cov_to_Cl(C, **kwargs):
    """Convert a spin-0 Fourier-diagonal covariance back to binned Cls
    (src/proj_lambert.jl:415-419)."""
    from ..utils.spectra import get_Cl
    d = C.diag if isinstance(C, Diag) else C
    proj = d.proj
    alpha = proj.Nx * proj.Ny / float(proj.deltax) ** 2
    # the reference scales the sqrt-diagonal FIELD by sqrt(alpha)
    # (proj_lambert.jl:417); get_Cl is quadratic in the field, so the
    # equivalent output factor is alpha (a sqrt(alpha) output factor
    # left the round trip cov_to_Cl(Cl_to_Cov(Cl)) low by 1/sqrt(alpha))
    f = Field(jnp.sqrt(jnp.abs(d.arr)).astype(d.arr.dtype), d.basis, proj)
    return get_Cl(f, **kwargs) * alpha
