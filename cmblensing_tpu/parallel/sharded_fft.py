"""Distributed pencil FFTs over the spatial mesh.

`parallel/spatial.py` runs the lensing ODE on maps whose Ny axis is
sharded across devices; this module extends that to the rest of the
posterior pipeline: 2-D real FFTs — and with them every
Fourier-diagonal operator (covariances, beams, transfer functions,
bandpasses) — on spatially-sharded maps. The reference has no analog:
its FFTs are single-device FFTW/CUFFT plans (src/util_fft.jl) and it
warns outright above 1024² (src/proj_lambert.jl:54-56).

Scheme (the classic 2-D pencil decomposition, two tiled all_to_alls
per transform, each moving only the local block over the ICI):

  y-sharded map (..., Ny/P, Nx)
    --local rfft along x-->        (..., Ny/P, Kx)   complex, Kx = Nx/2+1
    --pad Kx to P|Kp, all_to_all-> (..., Ny, Kp/P)   kx-sharded
    --local full fft along y-->    (..., Ny, Kp/P)   spectral "pencil"

The spectral layout keeps ky complete on every device and shards kx,
so Fourier multipliers are applied locally by slicing the full
(Ny, Kp) multiplier with the same PartitionSpec. The inverse walks the
steps backwards. All steps are linear jnp ops inside one shard_map —
`jax.grad` flows through (all_to_all and fft both transpose exactly).

Zero-padding of the half-spectrum to a P-divisible Kp is exact: padded
kx columns are identically zero through fft/multiply/ifft and are
sliced off before the final irfft.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.field import Field
from .spatial import _yspec


def _axsize(mesh, axis_name):
    return dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]


def _kp(Nx, p):
    kx = Nx // 2 + 1
    return ((kx + p - 1) // p) * p


def _xspec(ndim, axis_name, batch_axis=None):
    """PartitionSpec sharding the LAST axis (kx pencils)."""
    lead = [batch_axis if ndim >= 4 else None] + [None] * (ndim - 3)
    return P(*(lead + [None, axis_name]))


# ---------------------------------------------------------------------
# local-block bodies (run INSIDE shard_map)
# ---------------------------------------------------------------------

def _rfft2_body(x, axis, p, Nx):
    kx = Nx // 2 + 1
    X = jnp.fft.rfft(x, axis=-1)                      # (..., Ny/P, Kx)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, _kp(Nx, p) - kx)]
    X = jnp.pad(X, pad)
    i, j = X.ndim - 2, X.ndim - 1
    # y-sharded -> kx-sharded: split kx, concatenate the Ny blocks
    X = jax.lax.all_to_all(X, axis, split_axis=j, concat_axis=i, tiled=True)
    return jnp.fft.fft(X, axis=-2)                    # full-Ny fft


def _irfft2_body(X, axis, p, Nx):
    kx = Nx // 2 + 1
    x = jnp.fft.ifft(X, axis=-2)
    i, j = x.ndim - 2, x.ndim - 1
    x = jax.lax.all_to_all(x, axis, split_axis=i, concat_axis=j, tiled=True)
    x = x[..., :kx]
    return jnp.fft.irfft(x, n=Nx, axis=-1)


# ---------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------

def rfft2_sharded(arr, mesh, axis_name="sp", batch_axis=None):
    """Unnormalized rfft2 of a y-sharded real array; returns the
    kx-sharded complex pencil (..., Ny, Kp/P) where Kp = Nx/2+1 padded
    up to a multiple of the spatial mesh axis (padding is exact
    zeros)."""
    p = _axsize(mesh, axis_name)
    Nx = arr.shape[-1]
    return jax.shard_map(
        partial(_rfft2_body, axis=axis_name, p=p, Nx=Nx), mesh=mesh,
        in_specs=_yspec(arr.ndim, axis_name, batch_axis),
        out_specs=_xspec(arr.ndim, axis_name, batch_axis),
        # check_vma must stay off here: jnp.fft's transpose rule drops
        # the varying-manual-axes annotation from its cotangent, so
        # jax.grad through a vma-checked fft body dies with "cotangent
        # type does not match function output ... {V:sp}". The flows
        # (parallel/spatial.py) run with the check ON.
        check_vma=False,
    )(arr)


def irfft2_sharded(X, Nx, mesh, axis_name="sp", batch_axis=None):
    """Normalized (1/(Ny*Nx)) inverse of rfft2_sharded; returns the
    y-sharded real map (..., Ny/P, Nx). (ifft carries the 1/Ny, irfft
    the 1/Nx — together exactly jnp.fft.irfft2's normalization.)"""
    p = _axsize(mesh, axis_name)
    return jax.shard_map(
        partial(_irfft2_body, axis=axis_name, p=p, Nx=Nx), mesh=mesh,
        in_specs=_xspec(X.ndim, axis_name, batch_axis),
        out_specs=_yspec(X.ndim, axis_name, batch_axis),
        check_vma=False,  # same fft-transpose vma limitation as above
    )(X)


def pad_multiplier(mult, mesh, axis_name="sp"):
    """Pad a full (..., Ny, Kx) Fourier multiplier along kx to the Kp
    pencil width and lay it out kx-sharded, ready to multiply
    rfft2_sharded outputs elementwise."""
    p = _axsize(mesh, axis_name)
    kx = mult.shape[-1]
    kp = ((kx + p - 1) // p) * p
    pad = [(0, 0)] * (mult.ndim - 1) + [(0, kp - kx)]
    m = jnp.pad(jnp.asarray(mult), pad)
    sh = NamedSharding(mesh, _xspec(max(m.ndim, 3), axis_name))
    if m.ndim >= 3:
        return jax.device_put(m, sh)
    return jax.device_put(m, NamedSharding(mesh, P(None, axis_name)))


def fourier_diag_apply_sharded(mult_padded, f: Field, mesh,
                               axis_name="sp", batch_axis=None) -> Field:
    """Apply a Fourier-diagonal operator (beam, covariance, bandpass…)
    to a y-sharded map-basis Field: pencil rfft2, local elementwise
    multiply in the kx-sharded layout, pencil irfft2. The multiplier
    must come from pad_multiplier (same mesh/axis)."""
    arr = f.arr
    Nx = arr.shape[-1]
    X = rfft2_sharded(arr, mesh, axis_name, batch_axis)
    out = irfft2_sharded(X * mult_padded, Nx, mesh, axis_name, batch_axis)
    return Field(out, f.basis, f.proj)


def get_Cl_sharded(f1: Field, mesh, f2: Field = None, dl=50, ledges=None,
                   Clfid=None, axis_name="sp", batch_axis=None):
    """Binned (cross-)power spectrum of a y-sharded spin-0 map-basis
    Field — the diagnostics analog of utils.spectra.get_Cl, with the
    per-mode power computed and binned ON DEVICE (pencil rfft2 + local
    segment_sum + psum over the mesh): only the ~nbins bin values ever
    leave the devices. Weights/normalization match get_Cl exactly
    (inverse-variance per full-plane mode; the rfft half-plane carries
    the degeneracy factors)."""
    import numpy as np
    from ..utils.cls import Cls

    if f2 is None:
        f2 = f1
    if f1.basis.ncomp > 1:
        raise ValueError("index components first, e.g. get_Cl_sharded(f['E'], mesh)")
    proj = f1.proj
    if ledges is None:
        ledges = np.arange(0, 16001, dl)
    ledges = np.asarray(ledges, dtype=np.float64)

    # host-side: l grid, full-plane-equivalent inverse-variance weights
    # (lam = rfft degeneracy), bin ids; data-independent bin sums
    L = np.asarray(proj.lmag, np.float64)                      # (Ny, Kx)
    lam = np.broadcast_to(np.asarray(proj.lam_rfft, np.float64)[None, :],
                          L.shape)
    mask = (L > ledges.min()) & (L < ledges.max())
    with np.errstate(divide="ignore", invalid="ignore"):
        if Clfid is None:
            w = (2 * 1.0 ** 2 / (2 * L + 1)) ** -1
        else:
            w = (2 * np.asarray(Clfid(L), np.float64) ** 2 / (2 * L + 1)) ** -1
    w = np.nan_to_num(w) * lam * mask
    nbins = len(ledges) - 1
    ids = np.clip(np.digitize(L, ledges) - 1, 0, nbins - 1)
    ids = np.where(mask, ids, nbins)                           # dump bin
    A = np.bincount(ids.ravel(), weights=w.ravel(), minlength=nbins + 1)[:nbins]
    lb = np.bincount(ids.ravel(), weights=(w * L).ravel(),
                     minlength=nbins + 1)[:nbins]
    alpha = proj.Nx * proj.Ny / float(proj.deltax) ** 2

    # pad to the pencil width; padded columns land in the dump bin.
    # The device reduction runs in f32, so normalize the weights by
    # their max (w ~ (2L+1)/(2 Clfid^2) can overflow f32 for tiny
    # fiducial spectra) and undo the scale on the host.
    wscale = float(np.max(w)) or 1.0
    p = _axsize(mesh, axis_name)
    kp = ((L.shape[-1] + p - 1) // p) * p
    wpad = np.zeros((L.shape[0], kp), np.float32)
    wpad[:, :L.shape[1]] = w / (alpha * wscale)
    idpad = np.full((L.shape[0], kp), nbins, np.int32)
    idpad[:, :L.shape[1]] = ids

    X1 = rfft2_sharded(f1.arr, mesh, axis_name, batch_axis)[..., 0, :, :]
    X2 = (X1 if f2 is f1 else
          rfft2_sharded(f2.arr, mesh, axis_name, batch_axis)[..., 0, :, :])
    if X1.ndim > 2:
        # like get_Cl: spectra of the FIRST batch entry
        # (utils/spectra.py::get_Cl reshapes and takes [0])
        X1 = X1.reshape((-1,) + X1.shape[-2:])[0]
        X2 = X2.reshape((-1,) + X2.shape[-2:])[0]
    sh2 = P(None, axis_name)

    def body(x1, x2, wl, il):
        pw = wl * jnp.real(jnp.conj(x1) * x2)
        seg = jax.ops.segment_sum(pw.reshape(-1), il.reshape(-1),
                                  num_segments=nbins + 1)
        return jax.lax.psum(seg, axis_name)

    seg = jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh2, sh2, sh2, sh2), out_specs=P(),
        check_vma=True,
    )(X1, X2, jnp.asarray(wpad), jnp.asarray(idpad))
    Clb = np.asarray(seg)[:nbins] * wscale
    with np.errstate(invalid="ignore", divide="ignore"):
        return Cls(lb / A, Clb / A)
