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
