"""Non-uniform FFT (Fourier interpolation at scattered points).

TPU-native replacement for the reference's NFFT.jl dependency
(src/proj_healpix.jl:143-161, 272-283): evaluates the discrete Fourier
series of a regular (Ny, Nx) map at scattered fractional pixel
coordinates (type-2 NUFFT), and its exact adjoint (type-1), via the
Greengard & Lee (2004) Gaussian-gridding scheme: oversampled FFT +
deconvolution + a small separable Gaussian window, all as jnp
gathers/scatters — jit-able, differentiable, and gather-friendly on
TPU.

Accuracy ~1e-6 relative with the default (sigma=2, Msp=6) parameters.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_SIGMA = 2       # oversampling factor
_MSP = 6         # half-width of the spreading window (taps = 2*Msp)


@functools.lru_cache(maxsize=None)
def _axis_consts(n: int):
    """(tau, deconv) for one axis of length n: Gaussian width and the
    spectral deconvolution factors on the centered frequency grid."""
    tau = np.pi * _MSP / (n * n * _SIGMA * (_SIGMA - 0.5))
    k = np.fft.fftfreq(n) * n                       # integer frequencies
    deconv = np.exp(tau * k * k)                    # 1/FT of the Gaussian
    return tau, deconv


def _spread_weights(frac, tau, n_over):
    """Gaussian window weights at integer offsets around a fractional
    oversampled-grid position. frac: (npts,) in [0, n_over);
    returns (idx (npts, 2*Msp), w (npts, 2*Msp))."""
    i0 = jnp.floor(frac).astype(jnp.int32)
    offs = jnp.arange(-_MSP + 1, _MSP + 1)
    idx = (i0[:, None] + offs[None, :]) % n_over
    # distance in *original-grid* angular units: x = 2 pi j / n_over
    d = (frac[:, None] - (i0[:, None] + offs[None, :]))
    scale = 2 * np.pi / n_over
    w = jnp.exp(-((d * scale) ** 2) / (4 * tau))
    return idx, w


def nufft_eval(m, ys, xs):
    """Evaluate the periodic Fourier interpolant of map m (..., Ny, Nx)
    at fractional pixel coordinates (ys, xs) (each (npts,), 0-based).
    Returns (..., npts)."""
    Ny, Nx = m.shape[-2], m.shape[-1]
    tau_y, dec_y = _axis_consts(Ny)
    tau_x, dec_x = _axis_consts(Nx)
    oy, ox = _SIGMA * Ny, _SIGMA * Nx

    F = jnp.fft.fft2(m) / (Ny * Nx)
    F = F * jnp.asarray(dec_y)[:, None] * jnp.asarray(dec_x)[None, :]
    # zero-pad the centered spectrum to the oversampled grid
    Fs = jnp.fft.fftshift(F, axes=(-2, -1))
    # pad so the zero mode (at index N//2 after fftshift) lands at
    # index o//2 of the oversampled grid: left pad = o//2 - N//2 (the
    # floor/ceil split was off by one for odd axis lengths)
    pad = [(0, 0)] * (m.ndim - 2) + [
        (oy // 2 - Ny // 2, oy - Ny - (oy // 2 - Ny // 2)),
        (ox // 2 - Nx // 2, ox - Nx - (ox // 2 - Nx // 2))]
    Fp = jnp.pad(Fs, pad)
    Fp = jnp.fft.ifftshift(Fp, axes=(-2, -1))
    u = jnp.fft.ifft2(Fp) * (oy * ox)               # oversampled samples

    # windowed gather around each target
    fy = ys * _SIGMA
    fx = xs * _SIGMA
    iy, wy = _spread_weights(fy, tau_y, oy)         # (npts, T)
    ix, wx = _spread_weights(fx, tau_x, ox)
    # gather u at all (iy_t, ix_s) combinations: (npts, T, T)
    flat = u.reshape(m.shape[:-2] + (-1,))
    gidx = (iy[:, :, None] * ox + ix[:, None, :]).reshape(ys.shape[0], -1)
    vals = jnp.take(flat, gidx.reshape(-1), axis=-1).reshape(
        m.shape[:-2] + (ys.shape[0], 2 * _MSP, 2 * _MSP))
    w = (wy[:, :, None] * wx[:, None, :])
    norm = (np.pi / jnp.sqrt(tau_y * tau_x)) / (oy * ox)
    out = jnp.sum(vals * w, axis=(-1, -2)) * norm
    return jnp.real(out) if jnp.isrealobj(m) else out


def nufft_adjoint(vals, ys, xs, Ny, Nx):
    """Exact adjoint of nufft_eval: scattered values back onto a regular
    (Ny, Nx) grid (type-1 NUFFT)."""
    def fwd(m):
        return nufft_eval(m, ys, xs)

    proto = jnp.zeros((Ny, Nx), dtype=vals.dtype)
    (out,) = jax.linear_transpose(fwd, proto)(vals)
    return out
