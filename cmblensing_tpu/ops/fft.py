"""FFT backend for flat-sky fields.

The reference reaches FFTW/CUFFT through memoized plans
(src/util_fft.jl:20-44). On TPU there are two ways to run a 2-D rFFT
and we support both behind one interface:

  * "xla"    — jnp.fft.rfft2/irfft2, lowered to the XLA TPU FFT.
  * "matmul" — DFT as two tensor contractions with precomputed DFT
               matrices. O(N^3) FLOPs instead of O(N^2 log N), but the
               FLOPs run on the MXU systolic array which has an order
               of magnitude more throughput than the VPU path the
               built-in FFT uses; for the small-to-medium grids used
               in CMB lensing this often wins outright, and it fuses
               with neighboring elementwise work.
  * "auto"   — picks per-size (matmul for N <= _MATMUL_MAX).

All transforms are *unnormalized* forward (like FFTW), with the
inverse carrying the 1/(Ny*Nx), matching the reference conventions so
spectra/logpdf values agree.

Transforms act on the last two axes of (..., Ny, Nx) arrays.
"""
from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_MODE = "auto"
_MATMUL_MAX = 1024  # grids with max(Ny,Nx) <= this use matmul DFT in auto mode


def set_fft_mode(mode: str):
    """Set global FFT backend: 'xla', 'matmul', or 'auto'.

    NOTE trace-time binding: the mode is read when a function is
    TRACED. Already-compiled jit executables keep the backend they were
    traced with — call .clear_cache() on them (or build new jits) after
    switching modes."""
    global _MODE
    assert mode in ("xla", "matmul", "auto")
    global_cache_clear()
    _MODE = mode


def get_fft_mode() -> str:
    return _MODE


def _use_matmul(Ny, Nx, arr=None):
    if _MODE == "xla":
        return False
    if _MODE == "matmul":
        return True
    # auto: the matmul-DFT only pays off on MXU-class hardware
    try:
        on_accel = any(d.platform in ("tpu", "gpu") for d in arr.devices())
    except Exception:
        try:
            on_accel = jax.default_backend() in ("tpu", "gpu")
        except Exception:
            on_accel = True
    return on_accel and max(Ny, Nx) <= _MATMUL_MAX


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """Forward DFT matrix W[k,j] = exp(-2πi k j / n), as a numpy
    constant (always complex128; consumers cast as needed)."""
    j = np.arange(n)
    k = np.arange(n)
    W = np.exp(-2j * np.pi * np.outer(k, j) / n)
    return W


def global_cache_clear():
    _dft_mats.cache_clear()


def _matmul_rfft2(x):
    """rfft2 over last two axes via MXU contractions.

    x: real (..., Ny, Nx) -> complex (..., Ny, Nx//2+1)

    Implemented as: rFFT along x via one real-to-complex contraction
    (split into two real matmuls so the MXU sees real operands), then
    full complex FFT along y via complex matmuls.
    """
    Ny, Nx = x.shape[-2], x.shape[-1]
    rdt = x.dtype
    ndt = np.dtype(str(rdt))
    Wx = _dft_mats(Nx)[: Nx // 2 + 1]          # (Nxh, Nx)
    Wy = _dft_mats(Ny)                         # (Ny, Ny)
    WxT_re = jnp.asarray(Wx.real.T.astype(ndt))          # (Nx, Nxh)
    WxT_im = jnp.asarray(Wx.imag.T.astype(ndt))
    # x-axis rfft: (..., Ny, Nx) @ (Nx, Nxh); HIGHEST precision — the
    # TPU default truncates f32 matmul inputs to bf16
    HI = jax.lax.Precision.HIGHEST
    re = jnp.matmul(x, WxT_re, preferred_element_type=rdt, precision=HI)
    im = jnp.matmul(x, WxT_im, preferred_element_type=rdt, precision=HI)
    # y-axis full complex fft: contract over Ny (axis -2):
    Wy_re = jnp.asarray(Wy.real.astype(ndt))
    Wy_im = jnp.asarray(Wy.imag.astype(ndt))
    # out[k,m] = sum_j Wy[k,j] z[j,m]
    es = lambda A, B: jnp.einsum("kj,...jm->...km", A, B, precision=HI)
    out_re = es(Wy_re, re) - es(Wy_im, im)
    out_im = es(Wy_re, im) + es(Wy_im, re)
    return jax.lax.complex(out_re, out_im)


def _matmul_irfft2(X, Nx: int):
    """Inverse of _matmul_rfft2 (normalized by 1/(Ny*Nx)).

    X: complex (..., Ny, Nxh) -> real (..., Ny, Nx)
    """
    Ny, Nxh = X.shape[-2], X.shape[-1]
    wide = X.dtype in (jnp.complex128, jnp.float64)
    rdt = jnp.float64 if wide else jnp.float32
    ndt = np.float64 if wide else np.float32
    # inverse fft along y (complex): conj(Wy)/Ny; Wy is symmetric so no
    # transpose is needed
    Wy = _dft_mats(Ny)
    Wyi_re = jnp.asarray((Wy.real / Ny).astype(ndt))
    Wyi_im = jnp.asarray((-Wy.imag / Ny).astype(ndt))
    Xre, Xim = jnp.real(X), jnp.imag(X)
    HI = jax.lax.Precision.HIGHEST
    es = lambda A, B: jnp.einsum("kj,...jm->...km", A, B, precision=HI)
    z_re = es(Wyi_re, Xre) - es(Wyi_im, Xim)
    z_im = es(Wyi_re, Xim) + es(Wyi_im, Xre)
    # irfft along x: real result = sum_k lam_k Re(conj-expanded)
    # Build (Nxh, Nx) matrices: out[j] = (1/Nx) * sum_k w_k [Re X_k cos(2πkj/Nx) - Im X_k sin(2πkj/Nx)]
    k = np.arange(Nxh)
    j = np.arange(Nx)
    lam = np.where((k == 0) | ((Nx % 2 == 0) & (k == Nxh - 1)), 1.0, 2.0)
    ang = 2 * np.pi * np.outer(k, j) / Nx
    C = (lam[:, None] * np.cos(ang)) / Nx                # (Nxh, Nx)
    S = (lam[:, None] * np.sin(ang)) / Nx
    C = jnp.asarray(C.astype(ndt))
    S = jnp.asarray(S.astype(ndt))
    return (jnp.matmul(z_re, C, preferred_element_type=rdt, precision=HI)
            - jnp.matmul(z_im, S, preferred_element_type=rdt, precision=HI))


def rfft2(x):
    """Unnormalized forward real FFT over last two axes."""
    Ny, Nx = x.shape[-2], x.shape[-1]
    if _use_matmul(Ny, Nx, x):
        return _matmul_rfft2(x)
    return jnp.fft.rfft2(x)


def irfft2(X, Nx: int):
    """Normalized (1/(Ny*Nx)) inverse real FFT over last two axes."""
    Ny = X.shape[-2]
    if _use_matmul(Ny, Nx, X):
        return _matmul_irfft2(X, Nx)
    return jnp.fft.irfft2(X, s=(Ny, Nx))


def fft2(x):
    return jnp.fft.fft2(x)


def ifft2(X):
    return jnp.fft.ifft2(X)


def unfold(X, Nx=None):
    """Expand a half-plane rfft2 array (..., Ny, Nx//2+1) to the full
    plane (..., Ny, Nx) using conjugate symmetry (src/util_fft.jl:81-97,
    transposed layout). Nx is inferred assuming even Nx unless given
    explicitly (required for odd grids: Nxh = Nx//2+1 is ambiguous)."""
    Nxh = X.shape[-1]
    if Nx is None:
        Nx = 2 * (Nxh - 1)
    assert Nx // 2 + 1 == Nxh, (Nx, Nxh)
    # full-plane entry at (ky, kx) for kx > Nx/2 equals conj of entry at (-ky, Nx-kx)
    rest = X[..., :, 1:-1] if Nx % 2 == 0 else X[..., :, 1:]
    rest = jnp.conj(rest[..., ::-1])          # reverse kx
    # reverse ky (with wrap: row 0 stays)
    rest = jnp.concatenate([rest[..., :1, :], rest[..., 1:, :][..., ::-1, :]], axis=-2)
    return jnp.concatenate([X, rest], axis=-1)


@functools.lru_cache(maxsize=None)
def fftsyms(Ny: int, Nx: int):
    """rfft2 half-plane symmetry bookkeeping (src/util_fft.jl:112-124,
    transposed layout: our half axis is the LAST one).

    Returns numpy arrays over the (Ny, Nx//2+1) half-plane:

    * ``ireal`` — bool mask of entries whose real part is a unique DOF
    * ``iimag`` — bool mask of entries whose imag part is a unique DOF
    * ``(src_y, src_x)`` — int index maps such that every entry equals
      ``conj(X[src_y, src_x])`` where ``conj_mask`` is True and
      ``X[src_y, src_x]`` (identity) elsewhere
    * ``conj_mask`` — bool mask of the redundant (conjugate-partner)
      entries

    ``ireal.sum() + iimag.sum() == Ny*Nx`` — the real DOF count of the
    underlying map.
    """
    Nxh = Nx // 2 + 1
    ireal = np.ones((Ny, Nxh), bool)
    iimag = np.ones((Ny, Nxh), bool)
    src_y = np.tile(np.arange(Ny)[:, None], (1, Nxh))
    src_x = np.tile(np.arange(Nxh)[None, :], (Ny, 1))
    conj_mask = np.zeros((Ny, Nxh), bool)
    selfconj_cols = [0] + ([Nx // 2] if Nx % 2 == 0 else [])
    for c in selfconj_cols:
        for ky in range(Ny):
            ky_neg = (-ky) % Ny
            if ky == ky_neg:          # self-conjugate entry: purely real
                iimag[ky, c] = False
            elif ky > Ny // 2:        # redundant: conj of (Ny-ky, c)
                ireal[ky, c] = False
                iimag[ky, c] = False
                src_y[ky, c] = ky_neg
                conj_mask[ky, c] = True
    return ireal, iimag, (src_y, src_x), conj_mask


def rfft2vec(X, Nx=None):
    """Pack an rfft2 half-plane array (..., Ny, Nx//2+1) into a real
    vector (..., Ny*Nx) of its unique real/imag entries
    (src/util_fft.jl:49-54; generalized to rectangular grids and
    leading batch axes). Nx is inferred assuming even Nx unless given.
    Inverse: :func:`vec2rfft`."""
    Ny, Nxh = X.shape[-2:]
    if Nx is None:
        Nx = 2 * (Nxh - 1)
    assert Nx // 2 + 1 == Nxh, (Nx, Nxh)
    ireal, iimag, _, _ = fftsyms(Ny, Nx)
    return jnp.concatenate(
        [jnp.real(X)[..., ireal], jnp.imag(X)[..., iimag]], axis=-1)


def vec2rfft(v, Ny=None, Nx=None):
    """Unpack a real vector produced by :func:`rfft2vec` back into the
    rfft2 half-plane array (..., Ny, Nx//2+1), restoring the redundant
    conjugate entries (src/util_fft.jl:56-72). With no shape given, a
    square even grid is assumed (Ny = Nx = sqrt(len))."""
    if Ny is None or Nx is None:
        n = int(round(np.sqrt(v.shape[-1])))
        assert n * n == v.shape[-1], \
            "vec length is not a square; pass Ny and Nx explicitly"
        Ny = Nx = n
    assert v.shape[-1] == Ny * Nx, (v.shape, Ny, Nx)
    Nxh = Nx // 2 + 1
    ireal, iimag, (src_y, src_x), conj_mask = fftsyms(Ny, Nx)
    nreal = int(ireal.sum())
    batch = v.shape[:-1]
    dt = jnp.result_type(v.dtype, np.complex64)
    re = jnp.zeros(batch + (Ny, Nxh), v.dtype).at[..., ireal].set(
        v[..., :nreal])
    im = jnp.zeros(batch + (Ny, Nxh), v.dtype).at[..., iimag].set(
        v[..., nreal:])
    X = (re + 1j * im).astype(dt)
    Xg = X[..., src_y, src_x]
    return jnp.where(conj_mask, jnp.conj(Xg), Xg)
