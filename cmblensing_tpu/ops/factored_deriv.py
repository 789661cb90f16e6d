"""MXU-factored spectral derivatives.

The dense circulant derivative (ops/deriv.py 'matmul' mode: one
N x N x N real matmul per plane-axis) runs at ~77% of the v5e MXU's
6-pass-f32 peak — there is no per-matmul headroom left, so the only
way below it is FEWER MACs. A circulant D of size N = B * A commutes
with the shift-by-A operator, so the radix-B DFT along the "slow"
index r (n = r*A + m) block-diagonalizes it:

    D = (F_B^H x I_A)  diag_k( G_k )  (F_B x I_A)

with B dense A x A blocks G_k (k = 0..B-1, G_{B-k} = conj(G_k); G_0
and G_{B/2} real). Applying D then costs

    * two radix-B butterfly stages along r  -> elementwise VPU work
    * 2 real + (B/2 - 1) complex A x A matmuls -> MXU

e.g. for N=1024, B=4: 6 units of (256x256)@(256 x rows) instead of
the dense 64 equivalent — ~10.7x fewer MXU MACs at identical (1e-7)
f32 parity, with the butterflies fusing into surrounding elementwise
work. Measured on v5e: 11.35x the dense matmul at N=1024 (B=4; B=8's
A=128 blocks give only 3.5x in a standalone matmul microbench — but
the FLOW programs are HBM-bound, not MXU-bound, and whole-flow
measurements prefer B=8 at 1024: fa apply 4.35 vs 4.97 ms, backward
scan 11.7 vs 12.66 — so the radix policy in
ops/deriv.py::_pick_B_measured keeps A >= 256 except the measured
N=1024 exception, and the backward trace uses its own table
(_BWD_RADIX_TABLE: 2048 -> 16, 4096 -> 32)). This is the strict-f32
lever for the 1024^2 north star (VERDICT r3 item 1) and grows with N.

The blocks are constructed numerically from the SAME dense circulant
matrices as the 'matmul' backend (ops/deriv.py::_deriv_matrices), so
the two backends implement bitwise the same linear operator up to f32
rounding. Reference hot loop: src/lenseflow.jl:150-214 (SURVEY 3.2).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# =========================================================================
# host-side construction
# =========================================================================

def _block_diagonalize(D, B):
    """Split the circulant (N x N) D into its B diagonal blocks in the
    radix-B DFT domain along the slow index. Returns complex (B, A, A);
    raises if D is not shift-by-A invariant."""
    N = D.shape[0]
    assert N % B == 0
    A = N // B
    W = np.exp(-2j * np.pi * np.outer(np.arange(B), np.arange(B)) / B)
    D4 = D.reshape(B, A, B, A)
    # Ghat[k', k] = (1/B) sum_{r', r} W[r',k'] D4[r',:,r,:] conj(W[r,k])
    Ghat = np.einsum("rk,rasb,sl->kalb", W, D4, np.conj(W)) / B
    G = np.einsum("kakb->kab", Ghat)
    off = Ghat - np.einsum("kab,kl->kalb", G, np.eye(B))
    assert np.max(np.abs(off)) < 1e-9 * max(np.max(np.abs(G)), 1e-30), \
        "operator is not circulant at stride A"
    return G


def _real_butterfly_mats(B):
    """(Rf, Ri): real (B x B) forward/inverse transforms mapping the B
    real r-values to the B real DOF of the Hermitian radix-B spectrum
    [u_0, Re u_1, Im u_1, ..., Re u_{B/2-1}, Im u_{B/2-1}, u_{B/2}]."""
    assert B % 2 == 0
    W = np.exp(-2j * np.pi * np.outer(np.arange(B), np.arange(B)) / B)
    rows = [np.real(W[:, 0])]
    for k in range(1, B // 2):
        rows.append(np.real(W[:, k]))
        rows.append(np.imag(W[:, k]))
    rows.append(np.real(W[:, B // 2]))
    Rf = np.stack(rows)                      # (B, B): u_channels = Rf @ x_r
    Ri = np.linalg.inv(Rf)
    return Rf, Ri


class FactoredOp:
    """One factored circulant: real-channel block tensors ready for
    einsum application along either array axis."""

    __slots__ = ("B", "A", "Rf", "Ri", "Gre", "Gar", "Gai", "kre", "kcx",
                 "_jcache", "_jbcache")

    def jblocks(self):
        """Concrete jnp versions of the block tensors, cached on the
        instance. Tracing references the SAME jax.Array objects at
        every call site, so the whole program embeds each tensor ONCE
        — converting the numpy blocks per einsum call-site duplicated
        them (measured: 240 constant blobs, a 127MB HLO at 4096^2 that
        exceeded the remote compile helper's request limit)."""
        jc = getattr(self, "_jcache", None)
        if jc is None:
            # ensure_compile_time_eval: the conversion happens eagerly
            # even when jblocks() is first reached inside a jit trace,
            # so the cache holds concrete arrays, never tracers.
            # (Inside a shard_map body it still yields tracers — those
            # must NOT be cached; see ops.deriv.cache_concrete.)
            with jax.ensure_compile_time_eval():
                jc = tuple(None if a is None else jnp.asarray(a)
                           for a in (self.Gre, self.Gar, self.Gai))
            if not any(isinstance(a, jax.core.Tracer) for a in jc
                       if a is not None):
                self._jcache = jc
        return jc

    def jbutterflies(self):
        """Concrete jnp (Rf, Ri) for the batched apply path (same
        single-constant-per-program caching discipline as jblocks)."""
        jb = getattr(self, "_jbcache", None)
        if jb is None:
            with jax.ensure_compile_time_eval():
                jb = (jnp.asarray(self.Rf), jnp.asarray(self.Ri))
            if not any(isinstance(a, jax.core.Tracer) for a in jb):
                self._jbcache = jb
        return jb

    def __init__(self, D, B, dtype):
        N = D.shape[0]
        if B == 1:
            # degenerate radix: the factored path reduces to the dense
            # circulant matmul (used when N is too small to factor)
            self.B, self.A = 1, N
            self.Rf = self.Ri = None
            self.kre, self.kcx = (0,), ()
            self.Gre = np.asarray(D, dtype)[None]
            self.Gar = self.Gai = None
            return
        G = _block_diagonalize(np.asarray(D, np.float64), B)
        self.B, self.A = B, N // B
        # blocks stored as host numpy (kernel packing reads them);
        # jblocks() lazily caches concrete jnp versions for traces
        Rf, Ri = _real_butterfly_mats(B)
        self.Rf = Rf.astype(dtype)
        self.Ri = Ri.astype(dtype)
        # channel layout: [u0, Re u1, Im u1, ..., Re u_{B/2-1},
        # Im u_{B/2-1}, u_{B/2}] — the two REAL channels sit at 0, B-1
        self.kre = (0, B - 1)
        self.kcx = tuple(range(1, B // 2))
        self.Gre = np.stack([np.real(G[0]), np.real(G[B // 2])]).astype(dtype)
        if self.kcx:
            self.Gar = np.stack([np.real(G[k]) for k in self.kcx]).astype(dtype)
            self.Gai = np.stack([np.imag(G[k]) for k in self.kcx]).astype(dtype)
        else:
            self.Gar = self.Gai = None


@functools.lru_cache(maxsize=None)
def _factored_ops(n, delta, dtype_str, B):
    """(D1, D2) as FactoredOps for axis length n (cached per proj)."""
    from .deriv import _deriv_matrices
    D1, D2 = _deriv_matrices(n, delta, dtype_str)
    dt = np.dtype(dtype_str)
    return FactoredOp(D1, B, dt), FactoredOp(D2, B, dt)


# =========================================================================
# application
# =========================================================================
#
# Channels are kept as SEPARATE planes end-to-end (no concatenation
# until the single final stack): the butterfly combinations are scalar
# multiply-adds XLA fuses into the block-matmul operands/epilogues, so
# a derivative costs ~one read of x, B/2-ish small dots, one write of
# y. For B = 2 and 4 every butterfly weight is 0 or +-1 — the
# transforms are pure add/subs.

def _comb(planes, weights):
    """sum_r weights[r] * planes[r] with 0/+-1 fast paths."""
    acc = None
    for w, x in zip(weights, planes):
        w = float(w)
        if w == 0.0:
            continue
        term = x if w == 1.0 else (-x if w == -1.0 else x * w)
        acc = term if acc is None else acc + term
    return acc


def _apply_factored(x, op: FactoredOp, prec, side):
    B, A = op.B, op.A
    Gre, Gar, Gai = op.jblocks()
    sh = x.shape
    if side == "y":
        xr = x.reshape(sh[:-2] + (B, A, sh[-1]))
        xs = [xr[..., r, :, :] for r in range(B)]
        dot = lambda M, v: jnp.einsum("ab,...bx->...ax", M, v, precision=prec)
        stack_axis = -3
    else:
        xr = x.reshape(sh[:-1] + (B, A))
        xs = [xr[..., r, :] for r in range(B)]
        dot = lambda M, v: jnp.einsum("ab,...b->...a", M, v, precision=prec)
        stack_axis = -2

    # forward butterfly: B real channel planes
    us = [_comb(xs, op.Rf[c]) for c in range(B)]

    # diagonal blocks per channel (complex pairs share Ar/Ai)
    ys = [None] * B
    ys[0] = dot(Gre[0], us[0])
    ys[B - 1] = dot(Gre[1], us[B - 1])
    for i in range(len(op.kcx)):
        ur, ui = us[2 * i + 1], us[2 * i + 2]
        ar_ur = dot(Gar[i], ur)
        ai_ui = dot(Gai[i], ui)
        ai_ur = dot(Gai[i], ur)
        ar_ui = dot(Gar[i], ui)
        ys[2 * i + 1] = ar_ur - ai_ui
        ys[2 * i + 2] = ai_ur + ar_ui

    # inverse butterfly + single final stack back onto the axis
    outs = [_comb(ys, op.Ri[r]) for r in range(B)]
    return jnp.stack(outs, axis=stack_axis).reshape(sh)


def _apply_factored_batched(x, op: FactoredOp, prec, side):
    """The same factored operator as _apply_factored, expressed with a
    CONSTANT op count regardless of radix B: butterflies as one small
    (B x B) einsum each, all complex channel blocks as batched
    (K, A, A) matmuls (K = B/2 - 1). At B >= 8 the unrolled form emits
    O(B^2) fused multiply-adds per butterfly plus ~4B separate block
    dots — per RK stage, per flow step — which at 4096^2 (B=16) blew
    the XLA compile past an hour (VERDICT r3 item 1). This form is
    ~12 HLO ops per apply and compiles in seconds at any size; the
    extra cost is that the B x B butterfly einsums no longer fuse into
    the block-matmul epilogues (~2 plane round-trips per apply)."""
    B, A = op.B, op.A
    K = len(op.kcx)
    Gre, Gar, Gai = op.jblocks()
    Rf, Ri = op.jbutterflies()
    sh = x.shape
    if side == "y":
        # (..., B, A, Nx): channel axis -3, block contraction over -2
        xr = x.reshape(sh[:-2] + (B, A, sh[-1]))
        bfly = lambda M, v: jnp.einsum("cb,...bax->...cax", M, v,
                                       precision=prec)
        blk = lambda G, v: jnp.einsum("kab,...kbx->...kax", G, v,
                                      precision=prec)
        cax = -3
    else:
        # (..., B, A): channel axis -2, block contraction over -1
        xr = x.reshape(sh[:-1] + (B, A))
        bfly = lambda M, v: jnp.einsum("cb,...ba->...ca", M, v,
                                       precision=prec)
        blk = lambda G, v: jnp.einsum("kab,...kb->...ka", G, v,
                                      precision=prec)
        cax = -2

    u = bfly(Rf, xr)
    u_re = jnp.take(u, jnp.array([0, B - 1]), axis=cax)
    y_re = blk(Gre, u_re)
    y0 = jax.lax.slice_in_dim(y_re, 0, 1, axis=u.ndim + cax)
    yN = jax.lax.slice_in_dim(y_re, 1, 2, axis=u.ndim + cax)
    if K == 0:
        # B = 2: only the two real channels exist
        ys = jnp.concatenate([y0, yN], axis=cax)
    else:
        ur = jax.lax.slice_in_dim(u, 1, B - 1, stride=2, axis=u.ndim + cax)
        ui = jax.lax.slice_in_dim(u, 2, B - 1, stride=2, axis=u.ndim + cax)
        yr = blk(Gar, ur) - blk(Gai, ui)
        yi = blk(Gai, ur) + blk(Gar, ui)
        # interleave (yr, yi) back into [Re u1, Im u1, ..., Re uK, Im uK]
        pair = jnp.stack([yr, yi], axis=u.ndim + cax + 1)
        mid_shape = (pair.shape[:u.ndim + cax] + (2 * K,)
                     + pair.shape[u.ndim + cax + 2:])
        mid = pair.reshape(mid_shape)
        ys = jnp.concatenate([y0, mid, yN], axis=cax)

    out = bfly(Ri, ys)
    return out.reshape(sh)


# Radix above which the batched formulation is used: B <= 8 keeps the
# unrolled form — its butterfly weights fuse into the block matmuls and
# it measures faster (v5e 2048^2 forward flow: 35.0 ms unrolled vs 52.9
# batched) with acceptable compile times (25 s / 98 s). At B = 16 the
# unrolled form's O(B^2)-term butterflies blow the 4096^2 compile past
# an hour; the batched form compiles in 11 s / 87 s and runs the flows
# at 298.6 / 833.0 ms (vs the FFT fallback's 948 / 1886 — the r3
# VERDICT item 1 blocker). Override: CMBL_FACTORED_BATCHED=0/1 forces
# one form everywhere.
import os as _os
_BATCHED_MIN_B = 16
_FORCE = _os.environ.get("CMBL_FACTORED_BATCHED")


def _use_batched(B):
    if _FORCE is not None:
        return _FORCE not in ("0", "")
    return B >= _BATCHED_MIN_B


def apply_y(x, op: FactoredOp, prec):
    """Factored D applied along axis -2 of (..., Ny, Nx)."""
    if op.B == 1:
        return jnp.einsum("ab,...bx->...ax", op.jblocks()[0][0], x,
                          precision=prec)
    if _use_batched(op.B):
        return _apply_factored_batched(x, op, prec, "y")
    return _apply_factored(x, op, prec, "y")


def apply_x(x, op: FactoredOp, prec):
    """Factored D applied along the last axis of (..., Ny, Nx)."""
    if op.B == 1:
        return jnp.matmul(x, op.jblocks()[0][0].T, precision=prec,
                          preferred_element_type=x.dtype)
    if _use_batched(op.B):
        return _apply_factored_batched(x, op, prec, "x")
    return _apply_factored(x, op, prec, "x")
