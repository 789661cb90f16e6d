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

# the whole shape part (array OR tuple) is captured in one group so the
# tuple branch never has to re-split the line (the instruction NAME
# also contains the op string, e.g. `%all-to-all.9 = (...) all-to-all(`)
_OP_RE = re.compile(
    r"=\s*(\([^)]*\)|\w+\[[\d,]*\][^ ]*)\s+"
    r"(all-to-all|all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(?:-start)?\(")
_TUPLE_ELEM_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def _hlo_text(lowered_or_fn, args):
    obj = lowered_or_fn
    if callable(obj) and not hasattr(obj, "compile") and not hasattr(obj, "as_text"):
        import jax
        obj = jax.jit(obj).lower(*args)
    if hasattr(obj, "compile"):
        obj = obj.compile()
    return obj.as_text()


def _tally(lines):
    stats = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in lines:
        m = _OP_RE.search(line)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        # array `f32[8,32]{1,0}` and tuple `(f32[1,8,8]{2,1,0}, ...)`
        # shapes both reduce to a sum over their element buffers (the
        # CPU backend decomposes a tiled all_to_all into a P-buffer
        # tuple; TPU keeps one array — same per-device payload)
        nbytes = sum(_shape_bytes(d, s)
                     for d, s in _TUPLE_ELEM_RE.findall(shape))
        stats[op]["count"] += 1
        stats[op]["bytes"] += nbytes
    return {k: v for k, v in stats.items() if v["count"]}


def collective_stats(lowered_or_fn, *args):
    """Tally collectives in an SPMD program's optimized HLO.

    Accepts a `jax.jit(...)`-ed function plus its example args (it will
    be lowered + compiled here), or an already-lowered/compiled object.
    Returns {op_name: {"count": n, "bytes": per_device_payload_bytes}}:
    `bytes` sums each collective's OUTPUT buffer size on ONE device
    (the standard per-chip payload the ring model consumes).
    """
    return _tally(_hlo_text(lowered_or_fn, args).splitlines())


def collective_stats_by_computation(lowered_or_fn, *args):
    """Like `collective_stats`, but split per HLO computation:
    {computation_name: stats}. The entry computation runs ONCE per
    dispatch while a `lax.scan`/`while` body computation runs once per
    trip, so the DYNAMIC payload of a program whose only loop is the
    RK time scan is

        entry_bytes + nsteps * body_bytes

    (`flow_dynamic_a2a_bytes` does exactly this)."""
    out = {}
    cur = "ENTRY"
    block = []
    for line in _hlo_text(lowered_or_fn, args).splitlines():
        starts_comp = (line and not line[0].isspace()
                       and line.rstrip().endswith("{"))
        if starts_comp:
            if block:
                s = _tally(block)
                if s:
                    out[cur] = s
            name = line.split()[0].lstrip("%")
            cur = "ENTRY" if line.startswith("ENTRY") else name
            block = []
        else:
            block.append(line)
    if block:
        s = _tally(block)
        if s:
            out[cur] = s
    return out


def flow_dynamic_a2a_bytes(stats_by_comp, nsteps):
    """Dynamic per-device all_to_all payload of one flow dispatch from
    a `collective_stats_by_computation` tally: the entry computation
    fires once (the φ grad/hess prologue), every non-entry computation
    holding collectives is the RK time-scan body firing `nsteps`
    times."""
    total = 0
    for name, stats in stats_by_comp.items():
        b = stats.get("all-to-all", {}).get("bytes", 0)
        total += b if name == "ENTRY" else nsteps * b
    return total


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
    HLO tally (tests/test_comm_model.py asserts the compiled program
    matches this EXACTLY, plane for plane).

    Every y-derivative is a pencil round trip (all_to_all to the
    x-sharded layout and back); one all_to_all's per-device payload is
    `nplanes * Ny * Nx / P` elements. Per flow, in per-device PLANE
    units (one plane = Ny*Nx/P elements):

      * φ grad/hess prologue, once per dispatch (spin-0): transpose φ
        in (1), d_y φ and d_yy φ back (2), transpose d_x φ in (1),
        d_xy φ back (1) — the two y-derivatives of φ SHARE φ's inbound
        transpose, hence 5 planes, not 6
      * each RK4 stage moves the state's y-derivative round trip:
        2 all_to_alls × ncomp planes × 4 stages × nsteps steps

    (x-derivatives contract over the unsharded axis — no comms.)
    """
    P = int(n_devices)
    plane = proj.Ny * proj.Nx // P * itemsize
    ncomp = 2 if spin2 else 1
    per_flow = plane * (5 + 8 * nsteps * ncomp)
    return n_flows * per_flow
