"""Probe: factored vs dense circulant derivative at 1024^2 on TPU.
K-slope timing (chained inside one jit; dispatch-elision safe)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from cmblensing_tpu.ops.factored_deriv import _factored_ops, apply_x, apply_y
from cmblensing_tpu.ops.deriv import _deriv_matrices

N = int(os.environ.get("N", "1024"))
NC = int(os.environ.get("NC", "2"))   # spin-2: 2 planes
delta = 0.001
prec = jax.lax.Precision.HIGHEST

D1, _ = _deriv_matrices(N, delta, 'float32')
D1j = jnp.asarray(D1)

def dense_pair(x):
    dy = jnp.einsum("ij,cjk->cik", D1j, x, precision=prec)
    dx = jnp.matmul(x, D1j.T, precision=prec, preferred_element_type=x.dtype)
    return dy, dx

def make_fact(B):
    f1, _ = _factored_ops(N, delta, 'float32', B)
    def fact_pair(x):
        return apply_y(x, f1, prec), apply_x(x, f1, prec)
    return fact_pair

def chain(fn, K):
    @jax.jit
    def run(x):
        def body(i, x):
            dy, dx = fn(x)
            return (dy + dx) * jnp.float32(1e-4)
        return jax.lax.fori_loop(0, K, body, x)
    return run

def slope(fn, K1=1, K2=33, reps=3):
    x = jnp.asarray(np.random.RandomState(0).randn(NC, N, N).astype(np.float32))
    r1, r2 = chain(fn, K1), chain(fn, K2)
    r1(x).block_until_ready(); r2(x).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r1(x).block_until_ready(); t1 = time.perf_counter()
        r2(x).block_until_ready(); t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (K2 - K1))
    return min(ts)

print(f"N={N} NC={NC} (per grad-pair = dy+dx of {NC} planes)")
t_dense = slope(dense_pair)
print(f"dense   : {t_dense*1e3:.3f} ms")
for B in (4, 8, 16):
    if N % B or N // B < 64:
        continue
    t = slope(make_fact(B))
    print(f"fact B={B:2d}: {t*1e3:.3f} ms  ({t_dense/t:.2f}x)")
