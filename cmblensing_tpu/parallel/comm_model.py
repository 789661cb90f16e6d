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


_REF_RE = re.compile(r"(condition|body|to_apply|calls|branch_computations)="
                     r"(\{[^}]*\}|%?[\w.\-]+)")
_COMP_NAME_RE = re.compile(r"%?([\w.\-]+)")


def _parse_computations(text):
    """{computation_name: [instruction lines]} from optimized HLO."""
    comps = {}
    cur, block = None, []
    for line in text.splitlines():
        starts_comp = (line and not line[0].isspace()
                       and line.rstrip().endswith("{"))
        if starts_comp:
            if cur is not None:
                comps[cur] = block
            head = line.split("(")[0]
            if line.startswith("ENTRY"):
                cur = "ENTRY"
            else:
                m = _COMP_NAME_RE.search(head.strip())
                cur = m.group(1) if m else head.strip()
            block = []
        else:
            block.append(line)
    if cur is not None:
        comps[cur] = block
    return comps


def _refs(lines):
    """[(kind, computation_name)] references made by a computation's
    instructions. kind: 'loop' for while bodies/conditions (fire once
    per trip), 'call' for fusions/calls/branches (fire once per parent
    execution)."""
    out = []
    for line in lines:
        for key, val in _REF_RE.findall(line):
            names = ([v.strip() for v in val.strip("{}").split(",")]
                     if val.startswith("{") else [val])
            for nm in names:
                nm = nm.lstrip("%").strip()
                if nm:
                    out.append((
                        "loop" if key in ("body", "condition") else "call",
                        nm))
    return out


def collective_loop_tree(lowered_or_fn, *args):
    """Nested collective tally following the HLO call graph.

    Returns {"name", "direct": {op: {count, bytes}}, "loops": [subtree]}:
    `direct` includes collectives in the computation itself AND in
    everything it calls once per execution (fusions, branches);
    `loops` are while-loop bodies/conditions — each fires once per
    trip, so the DYNAMIC payload of a node executed once is

        direct + sum(trips(loop) * dynamic(loop) for loop in loops)

    with trip counts supplied by the caller (tests know nsteps_flow,
    cg_nsteps, hmc_N). This is what lets CI assert per-CG-iteration and
    per-leapfrog collective bytes of the production sharded programs,
    loops nested inside loops included."""
    comps = _parse_computations(_hlo_text(lowered_or_fn, args))

    def build(name, stack=()):
        lines = comps.get(name, [])
        direct = _tally(lines)
        loops = []
        if name in stack:          # defensive: HLO call graphs are DAGs
            return {"name": name, "direct": direct, "loops": loops}
        for kind, child in _refs(lines):
            if child not in comps:
                continue
            sub = build(child, stack + (name,))
            if kind == "call":
                for op, s in sub["direct"].items():
                    d = direct.setdefault(op, {"count": 0, "bytes": 0})
                    d["count"] += s["count"]
                    d["bytes"] += s["bytes"]
                loops.extend(sub["loops"])
            else:
                loops.append(sub)
        return {"name": name, "direct": direct, "loops": loops}

    return build("ENTRY")


def tree_bytes(node, trips, op="all-to-all"):
    """Dynamic per-device payload of `op` for one execution of `node`,
    with every loop body firing `trips(depth_path)` times. `trips` is a
    function taking the tuple of loop names from the root to the body
    (outermost first) and returning its trip count."""
    def rec(n, path):
        total = n["direct"].get(op, {}).get("bytes", 0)
        for sub in n["loops"]:
            p = path + (sub["name"],)
            total += trips(p) * rec(sub, p)
        return total
    return rec(node, ())


def tree_collect_ops(node):
    """All collective op names appearing anywhere in the tree."""
    ops = set(node["direct"])
    for sub in node["loops"]:
        ops |= tree_collect_ops(sub)
    return ops


# -------------------------------------------------------------------------
# analytic per-program models (the pencil scheme's REQUIRED traffic)
# -------------------------------------------------------------------------

def _kp(proj, P):
    """Padded rfft column count: Kx = Nx//2+1 rounded up to a multiple
    of P (sharded_fft pads so the pencil all_to_all tiles evenly)."""
    kx = proj.Nx // 2 + 1
    return -(-kx // P) * P


def fourier_diag_a2a_bytes(proj, n_devices, ncomp=2, itemsize=4):
    """One sharded Fourier-diagonal apply (ShardedEBDiag on QU maps,
    fourier_diag_apply_sharded on spin-0): a pencil rfft2 + irfft2
    round trip = 2 all_to_alls, each carrying ncomp complex half-planes
    of Ny x Kp (padded) per device."""
    P = int(n_devices)
    return 2 * ncomp * proj.Ny * _kp(proj, P) * 2 * itemsize // P


def wf_iteration_a2a_bytes(proj, n_devices, nsteps_flow, itemsize=4):
    """One sharded-Wiener-filter CG iteration (parallel/sharded_wf.py
    ::_swf_run): the Hessian apply A(p) = Cf^-1 p + L' N^-1(L p) runs
    2 spin-2 flows (their phi prologues are loop-invariant — XLA hoists
    them to the solve entry) plus 3 EB-diag applies (Cf^-1, the fused
    noise sandwich, and the preconditioner).

    Per iteration: 2 flows x 8*ncomp planes/step x nsteps_flow
    + 3 EB-diag round trips."""
    P = int(n_devices)
    plane = proj.Ny * proj.Nx // P * itemsize
    flows = 2 * 8 * 2 * nsteps_flow * plane
    return flows + 3 * fourier_diag_a2a_bytes(proj, P, ncomp=2,
                                              itemsize=itemsize)


def grad_eval_a2a_bytes(proj, n_devices, nsteps_flow, itemsize=4):
    """Per-device all_to_all payload of ONE gradient evaluation of the
    sharded lensing logpdf wrt phi (sharded_lensing_logpdf under
    jax.grad). Validated coefficient-exactly against the compiled HLO
    at (N,P) = (32,4), (64,4), (64,8) (tests/test_comm_model.py):

      * continuous-adjoint flow pair: 16 planes/step forward +
        32 planes/step backward (the r4 flow model, unchanged)
      * 5 EB-diag (QU) round trips: forward M·B and Cn^-1 on the
        residual, and their backward re-applies feeding the flow
        cotangent (the f-prior Cf^-1 apply is dead code under
        grad-wrt-phi and XLA removes it)
      * the 11-plane phi grad/hess prologue (all plain f32 planes)

    The Cphi prior-quad gradient moves NO extra all_to_all: XLA serves
    it from the one all_gather of the two unpadded c64 phi-derivative
    half-planes it emits per gradient evaluation (see
    grad_eval_allgather_bytes — tallied separately because it is a
    different collective)."""
    P = int(n_devices)
    plane = proj.Ny * proj.Nx // P * itemsize
    flows = (16 + 32) * nsteps_flow * plane
    diags = 5 * fourier_diag_a2a_bytes(proj, P, 2, itemsize)
    prologue = 11 * plane
    return flows + diags + prologue


def grad_eval_allgather_bytes(proj, itemsize=4):
    """The ONE all_gather per sharded-logpdf gradient evaluation: two
    full (not /P) unpadded c64 rfft half-planes of Ny x (Nx//2+1) —
    XLA's chosen materialization of the phi-derivative planes that
    both the prior-quad gradient and the flow prologue consume."""
    return 2 * proj.Ny * (proj.Nx // 2 + 1) * 2 * itemsize


def hmc_leapfrog_a2a_bytes(proj, n_devices, nsteps_flow, itemsize=4):
    """One sharded HMC leapfrog step (sharded_hmc_phi_step's scan
    body): one potential-gradient evaluation + one mass-matrix solve
    (spin-0 Fourier-diagonal round trip)."""
    P = int(n_devices)
    return (grad_eval_a2a_bytes(proj, P, nsteps_flow, itemsize)
            + fourier_diag_a2a_bytes(proj, P, 1, itemsize))


def gibbs_pass_a2a_bytes(proj, n_devices, cg_iters, hmc_N, nsteps_flow,
                         itemsize=4):
    """Dominant per-device all_to_all payload of ONE sharded Gibbs pass
    (sharded_gibbs_pass = constrained-realization WF draw + one HMC
    trajectory): cg_iters Wiener-filter iterations + hmc_N leapfrog
    steps + (hmc_N+2 gradient/energy bookkeeping evaluations are
    counted by the caller if exact totals are wanted — this function
    is the per-pass scaling model used for the v5e-8 prediction)."""
    P = int(n_devices)
    return (cg_iters * wf_iteration_a2a_bytes(proj, P, nsteps_flow,
                                              itemsize)
            + hmc_N * hmc_leapfrog_a2a_bytes(proj, P, nsteps_flow,
                                             itemsize))


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
