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
