"""ICI communication accounting for the spatially-sharded flows.

Multi-chip hardware is not attached in CI, so the pencil scheme's
inter-chip cost is made *falsifiable* instead of measured: compile the
actual sharded program on the virtual mesh, tally every collective's
payload bytes from the optimized HLO (`collective_stats`), and push
those bytes through an explicit ICI ring model (`predict_ici_time`).
The byte counts are asserted in tests/test_spatial.py so a regression
in the pencil scheme (an extra transpose, an accidental all_gather)
fails CI, and BENCH.md's "predicted v5e-8 flow time" rows show their
arithmetic. Reference analog: none — the reference's parallelism
(src/util_parallel.jl) never communicates inside a map.
"""
from __future__ import annotations

import re

import numpy as np

# payload bytes per element by HLO dtype shorthand
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "c64": 8, "s64": 8, "u64": 8, "f64": 8,
    "c128": 16,
}

_COLLECTIVES = ("all-to-all", "all-gather", "all-reduce",
                "reduce-scatter", "collective-permute")

_OP_RE = re.compile(
    r"=\s*(?:\([^)]*\)|(\w+)\[([\d,]*)\][^ ]*)\s+"
    r"(all-to-all|all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(?:-start)?\(")
_TUPLE_ELEM_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_stats(lowered_or_fn, *args):
    """Tally collectives in an SPMD program's optimized HLO.

    Accepts a `jax.jit(...)`-ed function plus its example args (it will
    be lowered + compiled here), or an already-lowered/compiled object.
    Returns {op_name: {"count": n, "bytes": per_device_payload_bytes}}:
    `bytes` sums each collective's OUTPUT buffer size on ONE device
    (the standard per-chip payload the ring model consumes).
    """
    obj = lowered_or_fn
    if callable(obj) and not hasattr(obj, "compile") and not hasattr(obj, "as_text"):
        import jax
        obj = jax.jit(obj).lower(*args)
    if hasattr(obj, "compile"):
        obj = obj.compile()
    txt = obj.as_text()

    stats = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in txt.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        if dtype is None:
            # tuple-shaped output: sum the element buffers
            head = line.split(op)[0]
            nbytes = sum(_shape_bytes(d, s)
                         for d, s in _TUPLE_ELEM_RE.findall(head))
        else:
            nbytes = _shape_bytes(dtype, dims)
        stats[op]["count"] += 1
        stats[op]["bytes"] += nbytes
    return {k: v for k, v in stats.items() if v["count"]}


def predict_ici_time(a2a_bytes_per_device, n_devices,
                     link_GBps=45.0, links_per_axis=2):
    """Ring-model time for the tallied all_to_all payload.

    v5e ICI: each chip has `links_per_axis` bidirectional links of
    ~`link_GBps` GB/s per direction on the sharded torus axis. For a
    tiled all_to_all of per-device buffer S over a P-ring, each chip
    injects S*(P-1)/P bytes and the bisection (2 links x 2 directions)
    carries half the global payload, so

        t  =  (P * S * (P-1)/P / 2)  /  (2 * links_per_axis * link_GBps)

    Returns seconds. `a2a_bytes_per_device` is collective_stats'
    "bytes" for all-to-all (the sum of output buffers on one device).
    """
    P = int(n_devices)
    S = float(a2a_bytes_per_device)
    bisection_Bps = 2.0 * links_per_axis * link_GBps * 1e9
    crossing = P * S * (P - 1) / P / 2.0
    return crossing / bisection_Bps


def flow_a2a_bytes(proj, n_devices, nsteps, n_flows=1, itemsize=4,
                   spin2=True):
    """Analytic all_to_all payload of ONE ShardedLenseFlow apply, per
    device: what the pencil scheme MUST move, for cross-checking the
    HLO tally.

    Every y-derivative inside the flow is 2 tiled all_to_alls (to the
    x-sharded pencil layout and back, ops/deriv.py::_ywrap), each with
    per-device payload = ncomp * Ny * Nx / P elements. Per flow:

      * _gradhess_phi: 3 spin-0 y-derivative round trips (grad_y phi,
        hess_yy phi, hess_xy phi via d_y(d_x phi))
      * each RK4 stage: 1 spin-(0|2) y-derivative round trip of the
        state (grad_y f inside _velocity); 4 stages/step x nsteps steps

    (x-derivatives contract over the unsharded axis — no comms.)
    """
    P = int(n_devices)
    plane = proj.Ny * proj.Nx // P * itemsize
    ncomp = 2 if spin2 else 1
    per_flow = 2 * plane * (3 + 4 * nsteps * ncomp)
    return n_flows * per_flow
