"""ICI communication accounting for the spatially-sharded flows
(parallel/comm_model.py): the compiled sharded program's all_to_all
payload is tallied from its optimized HLO and asserted against the
analytic pencil-scheme model, so a regression (an extra transpose, an
accidental all_gather) fails CI. Reference analog: none — the
reference's parallelism (src/util_parallel.jl) never communicates
inside a map."""
import numpy as np
import pytest
import jax

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.parallel.spatial import spatial_mesh, lense_sharded
from cmblensing_tpu.parallel.comm_model import (
    collective_stats, collective_stats_by_computation,
    flow_dynamic_a2a_bytes, flow_a2a_bytes, predict_ici_time)

NSTEPS = 7


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    return spatial_mesh(4, devices=devs)


def _flow_stats(mesh4, pol):
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    phi = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    f = F.randn(jax.random.PRNGKey(1), proj, pol=pol)
    if pol == "QU":
        f = f.to_lense()

    def go(phi, f):
        return lense_sharded(phi, f, mesh=mesh4, nsteps=NSTEPS).arr

    return proj, collective_stats_by_computation(jax.jit(go), phi, f)


@pytest.mark.parametrize("pol", ["I", "QU"])
def test_flow_a2a_bytes_match_analytic(mesh4, pol):
    """The compiled sharded flow moves EXACTLY the planes the pencil
    scheme requires: a 5-plane φ grad/hess prologue once per dispatch
    plus 2 state round trips × 4 RK stages per time step — nothing
    more (no hidden resharding)."""
    proj, by_comp = _flow_stats(mesh4, pol)
    dyn = flow_dynamic_a2a_bytes(by_comp, NSTEPS)
    ana = flow_a2a_bytes(proj, 4, NSTEPS, spin2=(pol == "QU"))
    assert dyn == ana, (by_comp, dyn, ana)


def test_flow_has_only_all_to_all(mesh4):
    """The pencil scheme's ONLY collective is the tiled all_to_all:
    an all_gather or all_reduce appearing in the flow program means a
    sharding annotation regressed into replication."""
    _, by_comp = _flow_stats(mesh4, "QU")
    ops = {op for stats in by_comp.values() for op in stats}
    assert ops == {"all-to-all"}, by_comp


def test_entry_vs_body_split(mesh4):
    """The φ prologue (5 spin-0 planes) runs once per dispatch in the
    entry computation; the per-step state round trips (16 spin-2
    planes) live in the scan body."""
    proj, by_comp = _flow_stats(mesh4, "QU")
    plane = proj.Ny * proj.Nx // 4 * 4
    entry = by_comp.get("ENTRY", {}).get("all-to-all", {}).get("bytes", 0)
    body = sum(s["all-to-all"]["bytes"] for name, s in by_comp.items()
               if name != "ENTRY")
    assert entry == 5 * plane, by_comp
    assert body == 16 * plane, by_comp


def test_flat_tally_consistent(mesh4):
    """collective_stats (flat) and the per-computation split tally the
    same instructions."""
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    phi = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    f = F.randn(jax.random.PRNGKey(1), proj, pol="QU").to_lense()

    def go(phi, f):
        return lense_sharded(phi, f, mesh=mesh4, nsteps=NSTEPS).arr

    flat = collective_stats(jax.jit(go), phi, f)
    by_comp = collective_stats_by_computation(jax.jit(go), phi, f)
    assert flat["all-to-all"]["bytes"] == sum(
        s["all-to-all"]["bytes"] for s in by_comp.values())


def test_gradient_flow_a2a_planes(mesh4):
    """The continuous-adjoint gradient program's pencil traffic, in
    per-device plane units: 11-plane prologue (φ grad/hess for BOTH
    integrations + cotangent setup) + per time step 16 planes in the
    forward scan body and 32 in the backward (state + δf + δφ-integrand
    round trips). Pinned exactly: any extra transpose or resharding in
    the custom_vjp shows up here first."""
    import jax.numpy as jnp
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    phi = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    f = F.randn(jax.random.PRNGKey(1), proj, pol="QU").to_lense()

    def loss(phi, f):
        return jnp.sum(lense_sharded(phi, f, mesh=mesh4, nsteps=NSTEPS).arr ** 2)

    by_comp = collective_stats_by_computation(
        jax.jit(jax.grad(loss, argnums=(0, 1))), phi, f)
    ops = {op for stats in by_comp.values() for op in stats}
    assert ops == {"all-to-all"}, by_comp
    plane = proj.Ny * proj.Nx // 4 * 4
    assert flow_dynamic_a2a_bytes(by_comp, NSTEPS) == 347 * plane, by_comp


# -------------------------------------------------------------------------
# full sharded posterior programs: CG iteration, HMC leapfrog, Gibbs pass
# (round-5: the comm model extended beyond the bare flows)
# -------------------------------------------------------------------------

from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.basis import Basis
from cmblensing_tpu.parallel.spatial import shard_spatial
from cmblensing_tpu.parallel.comm_model import (
    collective_loop_tree, tree_bytes, tree_collect_ops,
    fourier_diag_a2a_bytes, wf_iteration_a2a_bytes,
    grad_eval_a2a_bytes, grad_eval_allgather_bytes,
    hmc_leapfrog_a2a_bytes, gibbs_pass_a2a_bytes)


@pytest.fixture(scope="module")
def sim32():
    from cmblensing_tpu.models.dataset import load_sim
    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    return out


def _find_loops_with_a2a(node, out=None):
    out = [] if out is None else out
    for sub in node["loops"]:
        if sub["direct"].get("all-to-all", {}).get("bytes", 0):
            out.append(sub)
        _find_loops_with_a2a(sub, out)
    return out


def test_wf_cg_iteration_tally(mesh4, sim32):
    """One sharded-Wiener-filter CG iteration moves EXACTLY the pencil
    traffic the model requires: 3 EB-diag round trips in the while body
    (Cf^-1, the fused noise sandwich, the preconditioner) + 2 spin-2
    flows of 16 planes/time-step, verified from the compiled program's
    own loop nest — so an extra transpose or an accidental replication
    inside the solve fails CI."""
    from cmblensing_tpu.parallel import sharded_wf as SW
    from cmblensing_tpu.ops import deriv
    ds = sim32["ds"]
    phi = sim32["phi"]
    phi_m = phi.to(phi.basis.with_space("map"))
    proj = phi_m.proj
    plane = proj.Ny * proj.Nx // 4 * 4

    with deriv.mode_ctx("matmul"):
        def wf(d_arr, phi_arr):
            ds2 = ds.replace(d=Field(d_arr, ds.d.basis, ds.d.proj))
            f, _ = SW.sharded_wiener_filter(
                ds2, Field(phi_arr, phi_m.basis, proj), mesh4,
                nsteps=10, tol=0.0, jit=False)
            return f.arr
        tree = collective_loop_tree(jax.jit(wf), ds.d.arr, phi_m.arr)

    # the CG while body is the loop whose own loop nest holds the two
    # per-iteration flows (every other loop is a bare flow time scan)
    loops = _find_loops_with_a2a(tree)
    cg = [n for n in loops if _find_loops_with_a2a(n)]
    assert len(cg) == 1, [n["name"] for n in loops]
    cg = cg[0]

    ebdiag = fourier_diag_a2a_bytes(proj, 4, ncomp=2)
    assert cg["direct"]["all-to-all"]["bytes"] == 3 * ebdiag, cg["direct"]
    inner = _find_loops_with_a2a(cg)
    assert len(inner) == 2, [n["name"] for n in inner]
    for fl in inner:
        assert fl["direct"]["all-to-all"]["bytes"] == 16 * plane, fl

    # per-iteration total == the analytic model (flows x 7 steps + EB)
    per_iter = (cg["direct"]["all-to-all"]["bytes"]
                + sum(NSTEPS * fl["direct"]["all-to-all"]["bytes"]
                      for fl in inner))
    assert per_iter == wf_iteration_a2a_bytes(proj, 4, NSTEPS)

    # no replication creep inside any loop: all_gather only at entry,
    # all_reduce only for scalars (dots)
    for n in loops:
        assert "all-gather" not in n["direct"], n
        ar = n["direct"].get("all-reduce", {}).get("bytes", 0)
        assert ar < 1024, n


def test_grad_eval_tally(mesh4, sim32):
    """One gradient evaluation of the sharded lensing logpdf: the
    coefficient-exact decomposition (5 EB-diag QU round trips +
    11-plane prologue + 16/32-plane flow scans + ONE all_gather of the
    two unpadded c64 phi-derivative half-planes), asserted from the
    loop tree. This is the unit the HMC and Gibbs models compose."""
    import jax.numpy as jnp
    from cmblensing_tpu.parallel import sharded_wf as SW
    from cmblensing_tpu.ops import deriv
    ds = sim32["ds"]
    f_qu = sim32["f"].to(Basis("QU", "map"))
    phi_m = sim32["phi"].to(sim32["phi"].basis.with_space("map"))
    proj = phi_m.proj
    plane = proj.Ny * proj.Nx // 4 * 4

    with deriv.mode_ctx("matmul"):
        ops = SW._lensing_quadforms(ds, mesh4, "sp", None)
        fsh = shard_spatial(f_qu, mesh4)
        phish = shard_spatial(phi_m, mesh4)

        def U(parr):
            return SW.sharded_lensing_logpdf(
                ds, fsh, Field(parr, phi_m.basis, proj), mesh4, "sp",
                None, NSTEPS, _ops=ops)
        Ug = jax.grad(lambda x: jnp.sum(U(x)))
        tree = collective_loop_tree(jax.jit(Ug), phish.arr)

    loops = _find_loops_with_a2a(tree)
    assert sorted(n["direct"]["all-to-all"]["bytes"] // plane
                  for n in loops) == [16, 32], loops
    direct = tree["direct"]["all-to-all"]["bytes"]
    assert direct == (5 * fourier_diag_a2a_bytes(proj, 4, 2)
                      + 11 * plane), direct
    total = tree_bytes(tree, lambda path: NSTEPS)
    assert total == grad_eval_a2a_bytes(proj, 4, NSTEPS)
    ag = tree["direct"].get("all-gather", {})
    assert ag.get("count") == 1
    assert ag.get("bytes") == grad_eval_allgather_bytes(proj)


def test_hmc_leapfrog_tally(mesh4, sim32):
    """One leapfrog step of the production sharded HMC trajectory
    (parallel/sharded_wf.py::_hmc_traj_program, the exact program
    sharded_hmc_phi_step runs): per-frog all_to_all = one gradient
    evaluation + one spin-0 mass-matrix solve, with the scan body's
    tally taken from the compiled loop nest."""
    import jax.numpy as jnp
    from cmblensing_tpu.parallel import sharded_wf as SW
    from cmblensing_tpu.parallel.sharded_fft import (pad_multiplier,
                                                     fourier_diag_apply_sharded)
    from cmblensing_tpu.inference.sampling import mass_matrix_phi
    from cmblensing_tpu.ops import deriv
    ds = sim32["ds"]
    f_qu = sim32["f"].to(Basis("QU", "map"))
    phi_m = sim32["phi"].to(sim32["phi"].basis.with_space("map"))
    proj = phi_m.proj
    N_frog = 5

    with deriv.mode_ctx("matmul"):
        ops = SW._lensing_quadforms(ds, mesh4, "sp", None)
        Lam = mass_matrix_phi({}, ds)
        lam = jnp.real(jnp.asarray(Lam.diag.arr))
        inv_lam = pad_multiplier(SW._safe_inv(lam), mesh4, "sp")
        fsh = shard_spatial(f_qu, mesh4)
        phish = shard_spatial(phi_m, mesh4)

        def U(p):
            return SW.sharded_lensing_logpdf(ds, fsh, p, mesh4, "sp",
                                             None, NSTEPS, _ops=ops)
        Ug = jax.grad(lambda x: jnp.sum(U(Field(x, phi_m.basis, proj))))

        def solve(pa):
            return fourier_diag_apply_sharded(
                inv_lam, Field(pa, phi_m.basis, proj), mesh4, "sp",
                None).arr

        traj = SW._hmc_traj_program(
            U, lambda x: Field(Ug(x.arr), phi_m.basis, proj), solve,
            phi_m.basis, proj, N_frog, 0.01)
        tree = collective_loop_tree(traj, phish.arr, phish.arr)

    # the leapfrog scan body: the one loop with its own flow sub-loops
    loops = _find_loops_with_a2a(tree)
    frog = [n for n in loops if _find_loops_with_a2a(n)]
    assert len(frog) == 1, [n["name"] for n in loops]
    frog = frog[0]
    per_frog = (frog["direct"]["all-to-all"]["bytes"]
                + sum(NSTEPS * fl["direct"]["all-to-all"]["bytes"]
                      for fl in _find_loops_with_a2a(frog)))
    assert per_frog == hmc_leapfrog_a2a_bytes(proj, 4, NSTEPS)
    # the per-frog all_gather is the gradient evaluation's one
    assert frog["direct"].get("all-gather", {}).get("bytes") == \
        grad_eval_allgather_bytes(proj)


def test_gibbs_pass_model_composes():
    """The Gibbs-pass model is exactly its parts (the parts being
    HLO-asserted above): cg_iters WF iterations + hmc_N leapfrogs."""
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    got = gibbs_pass_a2a_bytes(proj, 4, cg_iters=10, hmc_N=5,
                               nsteps_flow=7)
    assert got == (10 * wf_iteration_a2a_bytes(proj, 4, 7)
                   + 5 * hmc_leapfrog_a2a_bytes(proj, 4, 7))


def test_bench_gibbs_prediction_row():
    """BENCH.md's 'predicted v5e-8 16384² Gibbs pass' row reproduces
    from the public API (cg_iters=25, hmc_N=25, nsteps_flow=7 — the
    production sample_512_batched recipe scaled up)."""
    proj = ProjLambert(16384, 16384, thetapix=2, T=np.float32)
    per_pass = gibbs_pass_a2a_bytes(proj, 8, cg_iters=25, hmc_N=25,
                                    nsteps_flow=7)
    plane = 16384 * 16384 // 8 * 4
    # WF iter: 2 flows x 16 planes x 7 steps + 3 EB-diag trips;
    # leapfrog: 48x7 flow planes + 5 EB + 11 prologue + 1 spin-0 solve
    kp = -(-(16384 // 2 + 1) // 8) * 8
    eb = 2 * 2 * 16384 * kp * 8 // 8
    s0 = eb // 2
    wf_it = (2 * 16 * 7) * plane + 3 * eb
    frog = 48 * 7 * plane + 5 * eb + 11 * plane + s0
    assert per_pass == 25 * wf_it + 25 * frog
    t = predict_ici_time(per_pass, 8)
    assert t == pytest.approx(per_pass * 7 / 8 / 2 / (4 * 45e9) * 8)


def test_predict_ici_time_arithmetic():
    """Ring-model arithmetic: per-device payload S over a P-ring
    crosses the bisection (2 links × 2 directions × link_GBps) once
    per (P-1)/P fraction; doubling devices at fixed per-device payload
    asymptotes, doubling payload doubles time."""
    t8 = predict_ici_time(1e9, 8)
    # 8 devices * 1e9 * 7/8 / 2 bytes over 4*45e9 B/s
    assert np.isclose(t8, (8 * 1e9 * 7 / 8 / 2) / (4 * 45e9))
    assert predict_ici_time(2e9, 8) == pytest.approx(2 * t8)


def test_bench_prediction_row():
    """BENCH.md's 'predicted v5e-8 16384² flow ICI time' row reproduces
    from the public API (its arithmetic is shown there)."""
    proj = ProjLambert(16384, 16384, thetapix=2, T=np.float32)
    per_flow = flow_a2a_bytes(proj, 8, nsteps=7, spin2=True)
    # 117 per-device planes of 16384*16384/8 f32 pixels
    assert per_flow == 117 * (16384 * 16384 // 8) * 4
    t = predict_ici_time(per_flow, 8)
    assert t == pytest.approx(per_flow * 8 * 7 / 8 / 2 / (4 * 45e9))
