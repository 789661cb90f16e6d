"""Counter-backed HBM floor for the backward flow (BENCH.md):
XLA's own cost model ("bytes accessed" / flops of the COMPILED,
fully-unrolled program — compiler accounting of the final fused op
graph, not hand estimates) against measured runtime, giving the
implied HBM bandwidth and MXU utilization. If the implied bandwidth
sits at the v5e's ~819 GB/s the measured time IS the memory floor of
this op graph.

Usage: python scripts/perf_bwd_floor.py [N] [nsteps]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.models import lenseflow as lf
from cmblensing_tpu.ops import deriv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NSTEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
deriv.set_deriv_mode(os.environ.get("CMBL_DMODE", "auto"))
deriv.set_matmul_precision(os.environ.get("CMBL_PREC", "f32"))

proj = ProjLambert(N, N, 2.0)
rs = np.random.RandomState(0)
f = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
df = jnp.asarray(rs.randn(2, N, N).astype(np.float32))
phi = jnp.asarray(rs.randn(1, N, N).astype(np.float32) * 1e-7)
g, h = jax.block_until_ready(jax.jit(lambda p: lf._gradhess_phi(p, proj))(phi))
c = jnp.float32(1e-3)

# HBM peak per chip: v5e 819 GB/s; MXU f32-HIGHEST (6-pass bf16)
HBM_GBPS = float(os.environ.get("CMBL_HBM_GBPS", "819"))
MXU_F32_TFLOPS = float(os.environ.get("CMBL_MXU_F32_TFLOPS", "32.75"))


def slope_time(step, x0, R1=3, R2=13):
    step = jax.jit(step)
    t0 = time.perf_counter()
    jax.block_until_ready(step(x0))
    compile_s = time.perf_counter() - t0

    def t(R):
        ts = []
        for _ in range(3):
            xx = x0
            tt0 = time.perf_counter()
            for _ in range(R):
                xx = step(xx)
            jax.block_until_ready(xx)
            ts.append(time.perf_counter() - tt0)
        return min(ts)

    return (t(R2) - t(R1)) / (R2 - R1) * 1e3, compile_s, step


def counters(jitted, x0):
    ca = jitted.lower(x0).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("bytes accessed", float("nan"))), \
        float(ca.get("flops", float("nan")))


def report(tag, step, x0):
    ms, compile_s, jitted = slope_time(step, x0)
    nbytes, flops = counters(jitted, x0)
    bw = nbytes / (ms * 1e-3) / 1e9
    mxu_ms = flops / (MXU_F32_TFLOPS * 1e12) * 1e3
    hbm_ms = nbytes / (HBM_GBPS * 1e9) * 1e3
    print(f"{tag:28s} {ms:8.2f} ms | XLA bytes {nbytes/1e9:6.2f} GB "
          f"-> implied {bw:5.0f} GB/s ({100*bw/HBM_GBPS:3.0f}% of peak) | "
          f"flops {flops/1e12:5.2f} T -> MXU floor {mxu_ms:5.1f} ms | "
          f"HBM floor {hbm_ms:5.1f} ms", flush=True)
    return dict(ms=ms, bytes=nbytes, flops=flops, bw=bw)


st0 = jnp.concatenate([f, df], axis=0)


def bwd_step(s):
    df0, dphi = lf._backward_flow_scan(s[:2], s[2:4], g, h, proj,
                                       1.0, 0.0, NSTEPS)
    return s + c * jnp.concatenate([df0, dphi + dphi, df0], axis=0)[:4]


def fwd_step(s):
    out = lf._lenseflow_apply(phi, s, 0.0, 1.0, NSTEPS, proj, backend="scan")
    return s + c * out


print(f"N={N} nsteps={NSTEPS} dmode={deriv._MODE} prec={deriv._PRECISION} "
      f"unroll={lf._unroll(proj)}", flush=True)
report("backward flow (scan)", bwd_step, st0)
report("forward flow (scan)", fwd_step, f)
