"""Sharded long-line regime: the 512-class sweep on the virtual mesh.

RESULTS.md claims 512^3 is the 2-chip sharded regime (single-chip HBM
excess); until round 3 no test ran the chunked long-line kernel at a
real 512-long sweep axis under the mesh.  This does: grid-X = 512 over an
8-device virtual mesh — the X direction reshards via all_to_all and each
shard then solves full 512-cell lines through the chunked kernel
(ops/pallas_sweep_long.py, n_sweep > 288), exactly the multi-chip hot
path of a 512^3 run (with a small cross-section to keep the interpreter
tractable).

Gated: CMCFS_LONG=1 (Pallas interpreter at 512-long chunked sweeps,
~10 min).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CMCFS_LONG") != "1",
    reason="long tier: set CMCFS_LONG=1 (~10 min on the virtual mesh)")


def test_sharded_512_sweep_chunked_matches_scan():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    n_dev = min(8, len(jax.devices()))
    plan = make_x_mesh(n_dev)
    adi3d, ga, cur, pa = g._setup(512, 16, 16, "scan")
    merge_ok = g._merge_ok(ga)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    dt = jnp.float32(0.01)

    outs = {}
    for backend, pl_, ga_, cur_ in (("fused_full", plan, ga_s, cur_s),
                                    ("scan", None, ga, cur)):
        new, err = adi3d.adi_timestep_3d(cur_, cur_, ga_, dt, num_global=1,
                                         num_local=1, pa=pa, backend=backend,
                                         exact=True, compute_error=True,
                                         plan=pl_, merge_ok=merge_ok)
        jax.block_until_ready(new)
        outs[backend] = (new, float(err))

    ref, err_ref = outs["scan"]
    got, err_got = outs["fused_full"]
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-7)
    assert abs(err_got - err_ref) < 1e-9


def test_dryrun_full_backend_sweep(monkeypatch):
    """The legacy-backend dryrun sweep (the round-3 gate content that blew
    the driver budget, MULTICHIP_r03 rc=124): now exercised here in the
    gated tier instead of in the driver gate — fused, fused_dma,
    fused_full, fused_bf16 and the nl=1 paths, all sharded."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setenv("CMCFS_DRYRUN_FULL", "1")
    mod.dryrun_multichip(8)
