"""Sum-accuracy modes (reference src/util.jl:288-316).

The reference offers :fast / :kahan / :float64 reduction modes for the
big pixel sums inside logpdf/dot, because at 4096^2 a naive float32
accumulation loses ~3-4 significant digits. TPU-native analogs:

  'fast'    — plain jnp.sum (XLA tree reduction; the default, already
              much better conditioned than a sequential sum)
  'float64' — accumulate in float64 (requires jax_enable_x64; silently
              equivalent to 'fast' otherwise, as jax keeps f32)
  'kahan'   — compensated (Kahan) summation, vectorized TPU-style:
              a lax.scan over the row axis carries per-lane (sum,
              compensation) pairs so the VPU does 128-wide compensated
              adds; only the final across-lane reduction is plain.

Set globally with set_sum_mode or per-call via asum(mode=...).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_MODE = "fast"


def set_sum_mode(mode: str):
    assert mode in ("fast", "float64", "kahan")
    global _MODE
    _MODE = mode


def get_sum_mode():
    return _MODE


def _kahan_last3(z):
    """Compensated sum over the last 3 axes; batch dims lead.
    Scan over the flattened (comp*row) axis with (Nx,)-lane carries."""
    b = z.shape[:-3]
    nrows = z.shape[-3] * z.shape[-2]
    lanes = z.shape[-1]
    zf = z.reshape(b + (nrows, lanes))
    # move scan axis first
    zf = jnp.moveaxis(zf, -2, 0)          # (nrows, *b, lanes)

    def step(carry, row):
        s, c = carry
        y = row - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    s0 = jnp.zeros(b + (lanes,), z.dtype)
    (s, c), _ = jax.lax.scan(step, (s0, s0), zf)
    # final across-lane reduction: also compensated (a plain f32 tree
    # reduce here would undo the row-wise compensation when lanes hold
    # large cancelling partials); scan the 2*lanes partials (s, -c)
    # with a scalar Kahan carry, vectorized over batch
    partials = jnp.concatenate([s, -c], axis=-1)      # (*b, 2*lanes)
    pf = jnp.moveaxis(partials, -1, 0)                # (2*lanes, *b)
    z0 = jnp.zeros(b, z.dtype)
    (st, ct), _ = jax.lax.scan(step, (z0, z0), pf)
    return st - ct


def asum(z, mode=None):
    """Accuracy-mode-aware sum over the last 3 axes (comp, Ny, Nx),
    keeping leading batch axes."""
    mode = mode or _MODE
    if mode == "float64":
        return jnp.sum(z.astype(jnp.float64), axis=(-1, -2, -3)).astype(
            jnp.result_type(z.dtype))
    if mode == "kahan":
        return _kahan_last3(z)
    return jnp.sum(z, axis=(-1, -2, -3))
