"""Flat-sky (Lambert azimuthal equal-area) projection metadata.

TPU-native analog of the reference's memoized ProjLambert
(src/proj_lambert.jl:24-75). A ProjLambert is a *hashable, frozen,
memoized* metadata object carried as static pytree aux-data on every
Field. Its grids (lx, ly, lmag, sin2phi, cos2phi, lam_rfft) are host
numpy arrays that become embedded constants when closed over inside a
jit trace — they are pure functions of (Ny, Nx, thetapix, T) so the
memoization guarantees one copy per geometry.

Layout note: arrays here are (..., ncomp, Ny, Nx) with the FFT over
the *last two* (minor) axes and the rfft half-axis along x — the
transpose of the reference's (Ny-half, Nx) layout — because XLA wants
contiguous minor dims for TPU FFT. All physical conventions
(deltax = deg2rad(thetapix/60), Omega_pix = deltax^2, unnormalized
FFTs, rfft degeneracy weights) match src/proj_lambert.jl:58-72 and
src/util_fft.jl:137-143.
"""
from __future__ import annotations

import functools
import numpy as np


def rfft_degeneracy_fac(n: int) -> np.ndarray:
    """Weights (along the rfft half-axis of full length n): 2 where the
    conjugate entry appears in the full-plane FFT, 1 where self-conjugate.
    Reference src/util_fft.jl:137-143."""
    if n % 2 == 0:
        return np.concatenate([[1.0], np.full(n // 2 - 1, 2.0), [1.0]])
    else:
        return np.concatenate([[1.0], np.full(n // 2, 2.0)])


class ProjLambert:
    """Flat-sky projection metadata (singleton per parameter set)."""

    _cache = {}

    def __new__(cls, Ny, Nx, thetapix=1.0, T=np.float32, rotator=(0.0, 90.0, 0.0)):
        T = np.dtype(T)
        key = (int(Ny), int(Nx), float(thetapix), T.str, tuple(map(float, rotator)))
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        self._init(*key[:3], T, key[4])
        cls._cache[key] = self
        return self

    def _init(self, Ny, Nx, thetapix, T, rotator):
        self.Ny = Ny
        self.Nx = Nx
        self.thetapix = thetapix
        # sky placement (ZYX Euler angles, degrees) — not used by any
        # flat-sky computation, but read by ProjHealpix `project`
        # (core/proj_healpix.py:125,133) to place this patch on the
        # sphere, mirroring the reference (src/proj_lambert.jl:24-43)
        self.rotator = rotator
        self.T = T
        self.complex_T = np.dtype(np.complex64) if T == np.dtype(np.float32) else np.dtype(np.complex128)

        # physical grid quantities, matching src/proj_lambert.jl:58-72
        deltax = np.deg2rad(thetapix / 60.0)
        self.deltax = T.type(deltax)
        self.Omega_pix = T.type(deltax ** 2)
        self.nyquist = T.type(2 * np.pi / (2 * deltax))
        self.delta_lx = T.type(2 * np.pi / (Nx * deltax))
        self.delta_ly = T.type(2 * np.pi / (Ny * deltax))

        # full-length ly (major axis), half-length lx (rfft axis = x)
        ly_full = np.fft.ifftshift(np.arange(-(Ny // 2), (Ny - 1) // 2 + 1)) * float(self.delta_ly)
        lx_full = np.fft.ifftshift(np.arange(-(Nx // 2), (Nx - 1) // 2 + 1)) * float(self.delta_lx)
        self.ly = ly_full.astype(T)                      # (Ny,)
        self.lx = lx_full[: Nx // 2 + 1].astype(T)       # (Nx//2+1,)

        LY = self.ly[:, None].astype(np.float64)
        LX = self.lx[None, :].astype(np.float64)
        self.lmag = np.sqrt(LX ** 2 + LY ** 2).astype(T)   # (Ny, Nx//2+1)

        # polarization rotation angle phi_l = atan2(ly, lx)
        phi = np.angle(LX + 1j * LY)
        sin2phi = np.sin(2 * phi)
        cos2phi = np.cos(2 * phi)
        # fixup at the lx-Nyquist column so conjugate-pair rows match
        # (transpose of src/proj_lambert.jl:69-71)
        if Nx % 2 == 0 and Ny > 1:
            rs = np.arange(1, (Ny - 1) // 2 + 1)
            sin2phi[Ny - rs, -1] = sin2phi[rs, -1]
        self.sin2phi = sin2phi.astype(T)
        self.cos2phi = cos2phi.astype(T)

        # rfft degeneracy weights along the half (x) axis
        self.lam_rfft = rfft_degeneracy_fac(Nx).astype(T)   # (Nx//2+1,)

        self.shape_map = (Ny, Nx)
        self.shape_fourier = (Ny, Nx // 2 + 1)

    # hashable / comparable by identity (singleton per parameter set)
    def __hash__(self):
        return hash((ProjLambert, self.Ny, self.Nx, self.thetapix, self.T.str, self.rotator))

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (f"ProjLambert(Ny={self.Ny}, Nx={self.Nx}, thetapix={self.thetapix}, "
                f"T={self.T.name})")

    # serialization by parameters only (src/proj_lambert.jl:204-236)
    def __reduce__(self):
        return (ProjLambert, (self.Ny, self.Nx, self.thetapix, self.T, self.rotator))

    @functools.cached_property
    def lam_rfft_2d(self):
        """(Ny, Nx//2+1) broadcastable degeneracy weights."""
        return np.broadcast_to(self.lam_rfft[None, :], self.shape_fourier).astype(self.T)


def pixwin(thetapix, ell):
    """Pixel window function for square flat-sky pixels of width thetapix
    arcmin (src/proj_lambert.jl:200)."""
    ell = np.asarray(ell, dtype=np.float64)
    # np.sinc(x) = sin(pi x)/(pi x), same convention as Julia's sinc
    return np.sinc(ell * np.deg2rad(thetapix / 60.0) / (2 * np.pi))
