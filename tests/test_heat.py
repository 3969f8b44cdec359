"""Heat-equation app: implicit stepping accuracy + checkpoint/resume."""

import numpy as np

from tpufem.apps.heat import run_heat


def test_heat_decay_accuracy():
    """Implicit Euler on u_t = Δu: solution decays at exp(-dim pi^2 t);
    error = O(dt) + spatial."""
    r = run_heat(dim=2, degree=2, refine=4, dt=5e-4, steps=20)
    # amplitude at t=0.01: exp(-2 pi^2 * 0.01) ~ 0.82
    assert r["l2_error"] < 5e-3, r["l2_error"]
    # halving dt roughly halves the time-discretization error
    r2 = run_heat(dim=2, degree=2, refine=4, dt=2.5e-4, steps=40)
    assert r2["l2_error"] < 0.7 * r["l2_error"]


def test_heat_checkpoint_resume_exact(tmp_path):
    ck = str(tmp_path / "ck.npz")
    full = run_heat(dim=2, degree=1, refine=3, dt=1e-3, steps=10)
    # run 10 steps with a checkpoint at 5, then resume for the rest
    run_heat(dim=2, degree=1, refine=3, dt=1e-3, steps=5,
             checkpoint=ck, checkpoint_every=5)
    resumed = run_heat(dim=2, degree=1, refine=3, dt=1e-3, steps=10,
                       resume=ck)
    assert np.array_equal(resumed["u"], full["u"]), (
        "resume must be bitwise identical to the uninterrupted run"
    )


def test_heat_distributed_matches_single(tmp_path):
    """--shards: every step's mass apply + Helmholtz CG distributed over
    8 devices — final state matches single-device to rounding, and a
    distributed checkpoint resumes a distributed run exactly."""
    single = run_heat(dim=2, degree=2, refine=3, dt=1e-3, steps=6)
    dist = run_heat(dim=2, degree=2, refine=3, dt=1e-3, steps=6,
                    shards=8)
    rel = (np.linalg.norm(dist["u"] - single["u"])
           / np.linalg.norm(single["u"]))
    assert rel < 1e-10, rel
    ck = str(tmp_path / "ck_dist.npz")
    run_heat(dim=2, degree=2, refine=3, dt=1e-3, steps=3, shards=8,
             checkpoint=ck, checkpoint_every=3)
    resumed = run_heat(dim=2, degree=2, refine=3, dt=1e-3, steps=6,
                       shards=8, resume=ck)
    assert np.array_equal(resumed["u"], dist["u"]), (
        "distributed resume must be bitwise identical"
    )
