"""Spectral derivative backends.

Two ways to apply exact (spectral) spatial derivatives on the flat
torus:

  'fft'    — rfft2 -> (i l) multiply -> irfft2 (XLA TPU FFT). FFT ops
             are fusion barriers, so each derivative costs several HBM
             round trips of the plane.

  'matmul' — the same linear operator expressed as a *real dense
             circulant matrix* applied along one axis:
                 d/dx f = f @ Dx^T ,  d/dy f = Dy @ f
             One real matmul per derivative, straight onto the MXU,
             no complex arithmetic, and XLA fuses all surrounding
             elementwise work into it. O(N^3) FLOPs instead of
             O(N^2 log N), but on TPU the MXU's throughput advantage
             and the removed fusion barriers win for N up to ~1k.

  'factored' — the circulant block-diagonalized in a radix-B DFT
             domain (ops/factored_deriv.py): two elementwise butterfly
             stages + B-ish MXU matmuls of (N/B)^2 — ~8-11x fewer MACs
             than 'matmul' at N=1024 (B=4) at identical f32 parity.

  'auto'   — factored where the radix factorization pays
             (N >= 512, divisible), else matmul up to _MATMUL_MAX,
             else fft.

These feed LenseFlow's velocity/adjoint flows (the hot kernels of the
whole framework; reference call stack SURVEY.md section 3.2).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import fft as _fft

_MODE = "auto"
# measured on v5e (r3, restructured flows): the factored backend beats
# the XLA TPU FFT decisively at 2048^2 (forward flow 35.8 vs 149.5ms,
# backward 129.8 vs 356.1ms); dense matmul is the reduced-precision
# choice up to _MATMUL_MAX
_MATMUL_MAX = 2048
_PRECISION = "f32"   # "f32" | "bf16" (bf16 inputs, f32 accumulate)


def set_deriv_mode(mode):
    global _MODE
    assert mode in ("fft", "matmul", "factored", "auto")
    _MODE = mode


def get_deriv_mode():
    return _MODE


def set_matmul_precision(p):
    """MXU operand precision for the circulant-derivative matmuls:

      'f32'  (default) — Precision.HIGHEST: true float32 (6 bf16 MXU
               passes). Required for gradients that must match the FFT
               backend / CPU to float32 tolerance.
      'high' — Precision.HIGH: 3-pass bf16 (~2^-21 relative, ~2x the
               throughput of 'f32'). Fine for MAP/HMC line searches.
      'bf16' — single-pass bf16 operands, f32 accumulate (~1e-3
               relative, fastest). Not for strict-parity tests.

    NOTE the TPU *default* matmul precision truncates f32 inputs to
    bf16 — leaving precision unset silently corrupts spectral
    derivatives (and through them every lensing gradient), so every
    matmul here pins it explicitly."""
    global _PRECISION
    assert p in ("f32", "high", "bf16")
    _PRECISION = p


def _prec():
    if _PRECISION == "high":
        return jax.lax.Precision.HIGH
    if _PRECISION == "bf16":
        # single-pass bf16 operands (the TPU DEFAULT) — the dense path
        # implements this with explicit casts; the factored einsum path
        # consumes this value directly
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _mm_x(a, M):
    """a @ M^T over the last axis (x-derivative)."""
    if _PRECISION == "bf16":
        return jnp.matmul(a.astype(jnp.bfloat16), M.T.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(a.dtype)
    return jnp.matmul(a, M.T, preferred_element_type=a.dtype,
                      precision=_prec())


def _mm_y(M, a):
    """M @ a over the -2 axis (y-derivative)."""
    if _PRECISION == "bf16":
        return jnp.einsum("ij,...jk->...ik", M.astype(jnp.bfloat16),
                          a.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(a.dtype)
    return jnp.einsum("ij,...jk->...ik", M, a,
                      precision=_prec())


import contextlib


@contextlib.contextmanager
def precision_ctx(p):
    """Temporarily override the matmul precision (e.g. 'high' for the
    Hessian applies inside CG while the residual algebra stays strict
    f32 — inexact-Krylov: the iterate error is bounded by the operator
    error ~2^-21, fine for tol >= 1e-4 at ~2x the throughput)."""
    global _PRECISION
    prev = _PRECISION
    set_matmul_precision(p)
    try:
        yield
    finally:
        _PRECISION = prev


# --- spatial sharding hook ------------------------------------------------
#
# Inside parallel/spatial.py's shard_map regions, arrays are LOCAL
# blocks of a map whose Ny axis is sharded over a mesh axis. The x
# direction stays fully local (contraction over the last axis), but a
# y-derivative contracts over the sharded axis: _ywrap transposes the
# pencil decomposition with one tiled all_to_all (y-sharded ->
# x-sharded), applies the full-Ny operator locally, and transposes
# back. This is the classic 2-D pencil scheme, riding the ICI with
# 2 all_to_alls (each moving only the local block) per y-apply instead
# of the (mesh_size x costlier) all_gather XLA would insert for a
# sharded-contraction matmul.

_SHARD_AXIS = None


@contextlib.contextmanager
def shard_ctx(axis_name):
    """Declare that arrays seen by this module during the enclosed
    trace are local y-sharded blocks over mesh axis `axis_name` (must
    be entered inside every independently-traced region — fwd AND bwd
    of any custom_vjp; see parallel/spatial.py)."""
    global _SHARD_AXIS
    prev = _SHARD_AXIS
    _SHARD_AXIS = axis_name
    try:
        yield
    finally:
        _SHARD_AXIS = prev


def _ywrap(fn, a):
    """Apply a full-Ny y-axis operator to a y-sharded local block via
    all_to_all pencil transposes (identity wrapper when unsharded)."""
    ax = _SHARD_AXIS
    if ax is None:
        return fn(a)
    i, j = a.ndim - 2, a.ndim - 1
    at = jax.lax.all_to_all(a, ax, split_axis=j, concat_axis=i, tiled=True)
    out = fn(at)
    return jax.lax.all_to_all(out, ax, split_axis=i, concat_axis=j, tiled=True)


def _ymat(M, a):
    """Shard-aware M @ a along axis -2."""
    return _ywrap(lambda t: _mm_y(M, t), a)


def _yfac(a, op, pr):
    """Shard-aware factored apply along axis -2."""
    from .factored_deriv import apply_y
    return _ywrap(lambda t: apply_y(t, op, pr), a)


@contextlib.contextmanager
def mode_ctx(mode):
    """Temporarily override the derivative backend (e.g. host-side eager
    setup on CPU wants 'fft'; traced TPU programs want 'matmul')."""
    global _MODE
    prev = _MODE
    set_deriv_mode(mode)
    try:
        yield
    finally:
        _MODE = prev


def _default_platform_is_accel():
    try:
        return jax.default_backend() in ("tpu", "gpu")
    except Exception:
        return True


def _arr_on_accel(arr):
    """Concrete arrays reveal their placement; tracers fall back to the
    process default backend."""
    try:
        return any(d.platform in ("tpu", "gpu") for d in arr.devices())
    except Exception:
        return _default_platform_is_accel()


def _pick_B_measured(n):
    """Radix for the factored circulant. MAC count falls as
    (2 + 4*(B/2-1))/B^2 of dense, but butterfly glue grows O(B^2), so
    the baseline policy keeps blocks at A = n/B >= 256, with one
    measured exception: at n = 1024 the A = 128 blocking (B = 8) wins
    BOTH flows on v5e (fa-kernel apply 4.35 vs 4.97 ms, backward scan
    11.7 vs 12.66 — the path is HBM-bound, so the lower MXU utilization
    of 128^2 blocks doesn't bite; B = 16 there is compile-bound and
    loses). Returns 1 when no radix pays (N < 512).
    Override: CMBL_RADIX_B."""
    import os
    env = os.environ.get("CMBL_RADIX_B")
    if env:
        b = int(env)
        # the butterfly machinery needs an even radix that divides n;
        # fall back to 1 (dense) rather than die on an assert deep in
        # _real_butterfly_mats
        return b if (b > 1 and b % 2 == 0 and n % b == 0) else 1
    if n == 1024:
        return 8
    B = 1
    for cand in (2, 4, 8, 16):
        if n % cand == 0 and n // cand >= 256:
            B = cand
    return B


# The backward (transpose-delta) scan carries a bigger per-stage
# working set than the forward flow, and at >= 2048 prefers smaller
# A blocks than the forward policy (v5e, scripts/perf_large.py:
# 2048^2 backward 114.7 ms at B=16 vs 129.8 at B=8; 4096^2 695 ms at
# B=32 vs 833 at B=16 — while the forward flow is the other way:
# 2048^2 35.8 at B=8 vs 43.6 at B=16, 4096^2 298.6 at B=16 vs 309.8
# at B=32). The backward trace opts in via bwd_radix_ctx();
# CMBL_RADIX_B still overrides.
_BWD_RADIX_TABLE = {2048: 16, 4096: 32}
_BWD_TRACE = False


@contextlib.contextmanager
def bwd_radix_ctx():
    """Mark the enclosed trace as backward-flow work so _fops picks the
    backward-measured radix table where it differs from the forward."""
    global _BWD_TRACE
    prev = _BWD_TRACE
    _BWD_TRACE = True
    try:
        yield
    finally:
        _BWD_TRACE = prev


# Auto-policy ceiling for the factored backend. Measured wins through
# 4096^2 (v5e forward/backward flow: 2048^2 35.0/131.6 ms factored vs
# 149.5/356.1 fft; 4096^2 298.6/833.0 vs 948/1886). The 4096^2 (B=16)
# programs use the batched-block apply (factored_deriv.py::
# _apply_factored_batched) which holds compiles to 11-87 s — the
# unrolled form r3 shipped took 1hr+ there, which is why the r3 ceiling
# was 2048. Override: CMBL_FACTORED_MAX.
import os as _osmod
_FACTORED_MAX = int(_osmod.environ.get("CMBL_FACTORED_MAX", "4096"))


def _backend(proj, arr=None):
    """'fft' | 'matmul' | 'factored' for this projection, precision
    aware: at strict f32 the factored path wins wherever the radix
    engages (1024^2 gradlnP 57.6 vs 78.9 ms dense on v5e), but at
    'high'/'bf16' the dense matmuls halve in cost and measure faster
    (42.4 vs 45.8 ms) — so reduced precision keeps the dense path."""
    if _SHARD_AXIS is not None:
        # spatially-sharded blocks: FFT along the sharded axis is
        # impossible — route 'fft'/'auto' to the MXU paths (factored
        # engages at any size since the dense circulant's embedded
        # N x N constants are what sharding exists to avoid)
        if _MODE in ("matmul", "factored"):
            return _MODE
        if _pick_B_measured(proj.Ny) > 1 and _pick_B_measured(proj.Nx) > 1:
            return "factored"
        return "matmul"
    if _MODE != "auto":
        return _MODE
    on_accel = _arr_on_accel(arr) if arr is not None else _default_platform_is_accel()
    if not on_accel:
        return "fft"
    n = max(proj.Ny, proj.Nx)
    if (_PRECISION == "f32"
            and _pick_B_measured(proj.Ny) > 1 and _pick_B_measured(proj.Nx) > 1
            and n <= _FACTORED_MAX):
        return "factored"
    return "matmul" if n <= _MATMUL_MAX else "fft"


@functools.lru_cache(maxsize=None)
def _deriv_matrices(n: int, delta: float, dtype_str: str):
    """(D1, D2): real n x n circulant matrices applying d/dx and d^2/dx^2
    along an axis with grid spacing delta. D[:, j] = deriv of e_j."""
    lx_full = np.fft.fftfreq(n, d=delta) * 2 * np.pi
    if n % 2 == 0:
        lx_full[n // 2] = 0.0  # Nyquist derivative := 0 (see _grids_np)
    eye = np.eye(n)
    F = np.fft.fft(eye, axis=0)
    D1 = np.real(np.fft.ifft((1j * lx_full)[:, None] * F, axis=0))
    D2 = np.real(np.fft.ifft((-lx_full ** 2)[:, None] * F, axis=0))
    dt = np.dtype(dtype_str)
    return D1.astype(dt), D2.astype(dt)


def cache_concrete(cache, key, make):
    """Memoize `make()` in `cache` ONLY if its leaves are concrete.
    jax.ensure_compile_time_eval yields real arrays under jit traces,
    but inside a shard_map body it still returns ShardMapTracers —
    caching one leaks it into later traces (the classic
    UnexpectedTracerError / 'must override ShardMapTracer' failures).
    Tracer results are returned uncached: inside a shard_map body each
    call site gets its own constant (the body is traced once, so the
    dedup this cache exists for doesn't apply there anyway)."""
    hit = cache.get(key)
    if hit is not None:
        return hit
    out = make()
    if not any(isinstance(l, jax.core.Tracer)
               for l in jax.tree_util.tree_leaves(out)):
        cache[key] = out
    return out


_JMATS_CACHE = {}


def _jmats(n, delta, dtype_str):
    """Concrete jnp circulant matrices, cached so every trace call
    site references the SAME jax.Array (one embedded constant per
    program instead of one per use — see FactoredOp.jblocks)."""
    def make():
        D1, D2 = _deriv_matrices(n, delta, dtype_str)
        with jax.ensure_compile_time_eval():
            return jnp.asarray(D1), jnp.asarray(D2)
    return cache_concrete(_JMATS_CACHE, (n, delta, dtype_str), make)


def _mats(proj, order=1):
    dt = proj.T.str
    d = float(proj.deltax)
    Dx1, Dx2 = _jmats(proj.Nx, d, dt)
    Dy1, Dy2 = _jmats(proj.Ny, d, dt)
    if order == 1:
        return Dx1, Dy1
    return (Dx1, Dx2, Dy1, Dy2)


def _fops(proj, n):
    from .factored_deriv import _factored_ops
    B = _pick_B_measured(n)
    if _BWD_TRACE and not _osmod.environ.get("CMBL_RADIX_B"):
        B = _BWD_RADIX_TABLE.get(n, B)
    return _factored_ops(n, float(proj.deltax), proj.T.str, B)


def _fd1(proj):
    """(FX1, FY1) first-derivative factored ops."""
    return _fops(proj, proj.Nx)[0], _fops(proj, proj.Ny)[0]


def _fd2(proj):
    return _fops(proj, proj.Nx)[1], _fops(proj, proj.Ny)[1]


@functools.lru_cache(maxsize=None)
def _grids_np(proj):
    """Derivative multipliers with the Nyquist line zeroed: the first
    derivative is an odd operator, so the (self-aliased) Nyquist mode's
    derivative is identically zero — this is also what the real
    circulant matrices produce, keeping both backends exactly equal."""
    lx = np.asarray(proj.lx, dtype=np.float64).copy()
    ly = np.asarray(proj.ly, dtype=np.float64).copy()
    if proj.Nx % 2 == 0:
        lx[-1] = 0.0
    if proj.Ny % 2 == 0:
        ly[proj.Ny // 2] = 0.0
    return lx, ly


def _grids(proj):
    lx, ly = _grids_np(proj)
    cdt = proj.complex_T
    ilx = jnp.asarray((1j * lx).astype(cdt))[None, :]
    ily = jnp.asarray((1j * ly).astype(cdt))[:, None]
    return ilx, ily


# --- public primitives (operate on (..., ncomp, Ny, Nx) map arrays) -------

def grad_xy(f_map, proj):
    """(df/dx, df/dy) of each component."""
    be = _backend(proj, f_map)
    if be == "factored":
        from .factored_deriv import apply_x, apply_y
        FX1, FY1 = _fd1(proj)
        return apply_x(f_map, FX1, _prec()), _yfac(f_map, FY1, _prec())
    if be == "matmul":
        Dx, Dy = _mats(proj, 1)
        return _mm_x(f_map, Dx), _ymat(Dy, f_map)
    ilx, ily = _grids(proj)
    F = _fft.rfft2(f_map)
    stack = jnp.concatenate([F * ilx, F * ily], axis=-3)
    out = _fft.irfft2(stack, proj.Nx)
    n = f_map.shape[-3]
    return out[..., :n, :, :], out[..., n:, :, :]


def div_xy(vx, vy, proj):
    """d/dx vx + d/dy vy."""
    be = _backend(proj, vx)
    if be == "factored":
        from .factored_deriv import apply_x, apply_y
        FX1, FY1 = _fd1(proj)
        return apply_x(vx, FX1, _prec()) + _yfac(vy, FY1, _prec())
    if be == "matmul":
        Dx, Dy = _mats(proj, 1)
        return _mm_x(vx, Dx) + _ymat(Dy, vy)
    ilx, ily = _grids(proj)
    V = _fft.rfft2(jnp.concatenate([vx, vy], axis=-3))
    n = vx.shape[-3]
    D = V[..., :n, :, :] * ilx + V[..., n:, :, :] * ily
    return _fft.irfft2(D, proj.Nx)


def gradhess(phi_map, proj):
    """((gx, gy), (hxx, hxy, hyy)) of a (..., 1, Ny, Nx) map."""
    be = _backend(proj, phi_map)
    if be == "factored":
        from .factored_deriv import apply_x, apply_y
        FX1, FY1 = _fd1(proj)
        FX2, FY2 = _fd2(proj)
        pr = _prec()
        gx = apply_x(phi_map, FX1, pr)
        gy = _yfac(phi_map, FY1, pr)
        hxx = apply_x(phi_map, FX2, pr)
        hyy = _yfac(phi_map, FY2, pr)
        hxy = _yfac(gx, FY1, pr)
        return (gx[..., 0, :, :], gy[..., 0, :, :]), \
               (hxx[..., 0, :, :], hxy[..., 0, :, :], hyy[..., 0, :, :])
    if be == "matmul":
        Dx1, Dx2, Dy1, Dy2 = _mats(proj, 2)
        mm = _mm_x
        my = _ymat
        gx = mm(phi_map, Dx1)
        gy = my(Dy1, phi_map)
        hxx = mm(phi_map, Dx2)
        hyy = my(Dy2, phi_map)
        hxy = my(Dy1, gx)
        return (gx[..., 0, :, :], gy[..., 0, :, :]), \
               (hxx[..., 0, :, :], hxy[..., 0, :, :], hyy[..., 0, :, :])
    ilx, ily = _grids(proj)
    PHI = _fft.rfft2(phi_map)
    gx_f = PHI * ilx
    gy_f = PHI * ily
    stack = jnp.concatenate([gx_f, gy_f, gx_f * ilx, gx_f * ily, gy_f * ily], axis=-3)
    out = _fft.irfft2(stack, proj.Nx)
    gx, gy, hxx, hxy, hyy = (out[..., i, :, :] for i in range(5))
    return (gx, gy), (hxx, hxy, hyy)


def div_plus_dij(ux, uy, s0, s1, s2, s3, proj):
    """ddx(ux) + ddy(uy) + sum_ij d_i d_j s_ij for s ordered
    (xx, yx, xy, yy) like dij_sum — regrouped as

        ddx(ux + ddx(s0) + ddy(s1)) + ddy(uy + ddx(s2) + ddy(s3))

    which is 6 matmuls instead of 10 (div 2 + dij 8) in matmul mode.
    All args are (..., Ny, Nx) planes; returns the same shape. This is
    the delta_phi accumulation of the LenseFlow backward flow
    (src/lenseflow.jl:176-214)."""
    be = _backend(proj, ux)
    if be in ("factored", "matmul"):
        if be == "factored":
            from .factored_deriv import apply_x, apply_y
            FX1, FY1 = _fd1(proj)
            pr = _prec()
            mm = lambda a: apply_x(a, FX1, pr)
            my = lambda a: _yfac(a, FY1, pr)
        else:
            Dx, Dy = _mats(proj, 1)
            mm = lambda a: _mm_x(a, Dx)
            my = lambda a: _ymat(Dy, a)
        # inner derivatives batched 2-wide (single-plane applies are
        # dispatch-bound; see bwd_stage_derivs)
        ix = mm(jnp.stack([s0, s2], axis=-3))
        iy = my(jnp.stack([s1, s3], axis=-3))
        ox = mm(ux + ix[..., 0, :, :] + iy[..., 0, :, :])
        oy = my(uy + ix[..., 1, :, :] + iy[..., 1, :, :])
        return ox + oy
    d = div_xy(ux[..., None, :, :], uy[..., None, :, :], proj)
    s = jnp.stack([s0, s1, s2, s3], axis=-3)
    return (d + dij_sum(s, proj))[..., 0, :, :]


def div_plus_dij5(ux, uy, sxx, sxy, syy, proj):
    """5-plane form of `div_plus_dij`: because d_x and d_y commute
    (circulants on different axes), the two cross planes s_yx and s_xy
    only ever enter as d_x d_y (s_yx + s_xy) — callers accumulate the
    SUM as one plane (sxy), cutting the backward flow's accumulator
    carry and per-stage integrand traffic from 6 planes to 5:

        ddx(ux + ddx(sxx) + ddy(sxy)) + ddy(uy + ddy(syy))
    """
    be = _backend(proj, ux)
    if be in ("factored", "matmul"):
        if be == "factored":
            from .factored_deriv import apply_x, apply_y
            FX1, FY1 = _fd1(proj)
            pr = _prec()
            mm = lambda a: apply_x(a, FX1, pr)
            my = lambda a: _yfac(a, FY1, pr)
        else:
            Dx, Dy = _mats(proj, 1)
            mm = lambda a: _mm_x(a, Dx)
            my = lambda a: _ymat(Dy, a)
        ix = mm(sxx)
        iy = my(jnp.stack([sxy, syy], axis=-3))
        ox = mm(ux + ix + iy[..., 0, :, :])
        oy = my(uy + iy[..., 1, :, :])
        return ox + oy
    return div_plus_dij(ux, uy, sxx, sxy, jnp.zeros_like(sxy), syy, proj)


def bwd_stage_derivs(f, pxdf, pydf, proj):
    """The derivative bundle of one backward-flow velocity evaluation
    (models/lenseflow.py::_backward_flow): returns (fx, fy, ddf) with

        fx = ddx(f), fy = ddy(f), ddf = ddx(pxdf) + ddy(pydf)

    for (..., ncomp, Ny, Nx) stacks, issued as ONE batched apply per
    derivative direction (matmul/factored backends) or one
    rfft2/irfft2 pair of 3*ncomp-plane stacks (fft backend). Batching
    matters: a single-plane factored apply at 1024^2 costs ~0.6 ms of
    dispatch+materialization vs ~46 us/plane when 4-wide (measured
    v5e; scripts/perf_bwd_ablate.py)."""
    n = f.shape[-3]
    be = _backend(proj, f)
    if be in ("factored", "matmul"):
        env = _osmod.environ.get("CMBL_BWD_NOCONCAT")
        if env is not None:
            noconcat = env not in ("", "0")
        else:
            # default: separate applies on one device (measured 1024^2
            # v5e backward flow 15.6 -> 12.7 ms, scripts/
            # perf_bwd_floor.py), but keep the single batched round
            # trip under shard_map — separate y-applies double the
            # all_to_all count for the same bytes, pure ICI latency
            noconcat = _SHARD_AXIS is None
        if noconcat:
            # issue the f and p·δf stacks as SEPARATE applies so the
            # p·δf elementwise producer fuses into its matmul operand
            # read instead of materializing through a 4-plane concat
            # buffer — fewer HBM bytes for narrower matmuls
            if be == "factored":
                from .factored_deriv import apply_x, apply_y
                FX1, FY1 = _fd1(proj)
                mm = lambda a: apply_x(a, FX1, _prec())
                my = lambda a: _yfac(a, FY1, _prec())
            else:
                Dx, Dy = _mats(proj, 1)
                mm = lambda a: _mm_x(a, Dx)
                my = lambda a: _ymat(Dy, a)
            fx = mm(f)
            fy = my(f)
            ddf = mm(pxdf) + my(pydf)
            return fx, fy, ddf
        ax = jnp.concatenate([f, pxdf], axis=-3)
        ay = jnp.concatenate([f, pydf], axis=-3)
        if be == "factored":
            from .factored_deriv import apply_x, apply_y
            FX1, FY1 = _fd1(proj)
            ox = apply_x(ax, FX1, _prec())
            oy = _yfac(ay, FY1, _prec())
        else:
            Dx, Dy = _mats(proj, 1)
            ox = _mm_x(ax, Dx)
            oy = _ymat(Dy, ay)
        fx = ox[..., :n, :, :]
        fy = oy[..., :n, :, :]
        ddf = ox[..., n:, :, :] + oy[..., n:, :, :]
        return fx, fy, ddf
    ilx, ily = _grids(proj)
    F = _fft.rfft2(jnp.concatenate([f, pxdf, pydf], axis=-3))
    Ff = F[..., :n, :, :]
    out = jnp.concatenate(
        [Ff * ilx, Ff * ily,
         F[..., n:2 * n, :, :] * ilx + F[..., 2 * n:, :, :] * ily],
        axis=-3)
    o = _fft.irfft2(out, proj.Nx)
    return o[..., :n, :, :], o[..., n:2 * n, :, :], o[..., 2 * n:, :, :]


def dij_sum(s, proj):
    """sum_{i,j} d_i d_j s_ij for s stacked (..., 4, Ny, Nx) in order
    (xx, yx, xy, yy) — i.e. s[0]: d_x d_x, s[1]: d_x d_y, s[2]:
    d_y d_x, s[3]: d_y d_y (matching the lenseflow backward flow)."""
    be = _backend(proj, s)
    if be == "factored":
        from .factored_deriv import apply_x, apply_y
        FX1, FY1 = _fd1(proj)
        pr = _prec()
        mm = lambda a: apply_x(a, FX1, pr)
        my = lambda a: _yfac(a, FY1, pr)
        s0 = s[..., 0, :, :]
        s1 = s[..., 1, :, :]
        s2 = s[..., 2, :, :]
        s3 = s[..., 3, :, :]
        return (mm(mm(s0)) + mm(my(s1)) + my(mm(s2)) + my(my(s3)))[..., None, :, :]
    if be == "matmul":
        Dx, Dy = _mats(proj, 1)
        mm = lambda a: _mm_x(a, Dx)
        my = lambda a: _ymat(Dy, a)
        s0 = s[..., 0, :, :]
        s1 = s[..., 1, :, :]
        s2 = s[..., 2, :, :]
        s3 = s[..., 3, :, :]
        return (mm(mm(s0)) + mm(my(s1)) + my(mm(s2)) + my(my(s3)))[..., None, :, :]
    ilx, ily = _grids(proj)
    S = _fft.rfft2(s)
    D = (S[..., 0, :, :] * ilx * ilx + S[..., 1, :, :] * ilx * ily
         + S[..., 2, :, :] * ily * ilx + S[..., 3, :, :] * ily * ily)
    return _fft.irfft2(D[..., None, :, :], proj.Nx)
