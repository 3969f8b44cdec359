"""CLI smoke tests: the apps as a user invokes them (subprocess)."""

import json
import subprocess
import sys


def run(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m"] + args, capture_output=True, text=True,
        timeout=timeout,
    )


def test_poisson_cli_json():
    r = run(["tpufem.apps.poisson", "--cpu", "--dim", "2", "--degree", "2",
             "--refine", "3", "--json", "--h1"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["n_dofs"] == 289
    assert rec["l2_error"] < 5e-4
    # H1 seminorm error: one order below L2 (O(h^p)); sane magnitude
    assert 1e-4 < rec["h1_error"] < 5e-2


def test_bmspmv_cli():
    r = run(["tpufem.apps.bmspmv", "--cpu", "--dim", "2", "--degrees", "2",
             "--refine", "3", "--dtype", "float64", "--reps", "2"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["bench"] == "bmspmv" and "gdofs_per_s" in rec
    assert rec["csr_cross_check_rel_err"] < 1e-12  # assembled oracle


def test_poisson_cli_chebyshev_nonbox():
    """--precond chebyshev on the uniform (non-box) tier: same L2 error,
    no more iterations than Jacobi.  (The manufactured RHS is near an
    eigenvector, so BOTH converge in a handful of iterations — the
    iteration-reduction assertion with a random RHS lives in
    test_general_partitioner.py.)"""
    args = ["tpufem.apps.poisson", "--cpu", "--dim", "2", "--degree",
            "3", "--refine", "4", "--scatter", "separable", "--json"]
    rj = run(args)
    rc = run(args + ["--precond", "chebyshev"])
    assert rj.returncode == 0 and rc.returncode == 0, rc.stderr[-500:]
    j = json.loads(rj.stdout.strip().splitlines()[-1])
    c = json.loads(rc.stdout.strip().splitlines()[-1])
    assert c["iterations"] <= j["iterations"]
    assert abs(c["l2_error"] - j["l2_error"]) < 1e-9
    # gmg on the non-box tier is a clear error, not a silent jacobi
    rg = run(["tpufem.apps.poisson", "--cpu", "--scatter", "separable",
              "--precond", "gmg"])
    assert rg.returncode != 0 and "poisson_mg" in rg.stderr


def test_poisson_cli_shell_mesh():
    """--mesh shell: the GridGenerator::hyper_shell analogue through the
    app — curved metric path, inhomogeneous Dirichlet from the
    manufactured trace, O(h^(p+1)) error magnitude."""
    errs = []
    for r in ("3", "4"):
        out = run(["tpufem.apps.poisson", "--cpu", "--mesh", "shell",
                   "--dim", "2", "--degree", "2", "--refine", r,
                   "--json"])
        assert out.returncode == 0, out.stderr[-500:]
        errs.append(json.loads(out.stdout.strip().splitlines()[-1])
                    ["l2_error"])
    assert errs[1] < errs[0] / 5  # ~8x for O(h^3)


def test_poisson_cli_bad_scatter_rejected():
    r = run(["tpufem.apps.poisson", "--cpu", "--scatter", "bogus"])
    assert r.returncode != 0
    assert "invalid choice" in r.stderr


def test_bmop_cli_distributed_shards():
    """bmop --shards: distributed box-tier apply benchmark over a
    device mesh (the reference's multi-GPU benchmark runs)."""
    import os

    env = dict(os.environ,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "tpufem.apps.bmop", "--cpu", "--dim", "3",
         "--degrees", "2", "--refine", "2", "--adaptive", "1",
         "--shards", "2x4", "--reps", "3"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["bench"] == "bmop-distributed" and rec["n_devices"] == 8
    assert rec["gdofs_per_s"] > 0


def test_poisson_cli_distributed_shards():
    """--shards 2x2: distributed box-tier solve over a device mesh (the
    multi-GPU poisson analogue, SURVEY.md §3.6); correct L2 error."""
    r = run(["tpufem.apps.poisson", "--cpu", "--dim", "3", "--degree",
             "2", "--refine", "2", "--adaptive-steps", "1",
             "--shards", "2x2", "--json"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["l2_error"] < 5e-3


def test_poisson_cli_distributed_gmg_shards():
    """--precond gmg composed with --shards (the app branch wiring
    BoxMultigrid + DistributedBoxMultigrid) plus --h1 on the box tier."""
    r = run(["tpufem.apps.poisson", "--cpu", "--dim", "3", "--degree",
             "2", "--refine", "2", "--adaptive-steps", "1",
             "--shards", "2x2", "--precond", "gmg", "--h1", "--json"],
            timeout=420)
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["l2_error"] < 5e-3
    assert rec["iterations"] <= 12  # GMG-CG, not O(100) Jacobi
    assert 0 < rec["h1_error"] < 0.5


def test_nonlinear_cli_quasilinear():
    r = run(["tpufem.apps.nonlinear", "--cpu", "--dim", "2", "--degree",
             "2", "--refine", "3", "--json"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["converged"] and rec["newton_iterations"] <= 12
    assert rec["l2_error"] < 5e-4


def test_nonlinear_cli_minimal_surface_gmres():
    r = run(["tpufem.apps.nonlinear", "--cpu", "--problem",
             "minimal-surface", "--linear", "gmres", "--refine", "2",
             "--rtol", "1e-9", "--json"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["converged"]


def test_elasticity_cli_gmg():
    """step-8 analogue: GMG-preconditioned elasticity solve, few
    iterations, manufactured L2 error at the discretization level."""
    r = run(["tpufem.apps.elasticity", "--cpu", "--dim", "2", "--degree",
             "2", "--refine", "3", "--precond", "gmg", "--json"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["converged"] and rec["iterations"] <= 15
    assert rec["l2_error"] < 5e-4
    assert rec["n_components"] == 2


def test_elasticity_cli_distributed():
    """--shards 8: the distributed vector operator through the CLI."""
    import os
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "tpufem.apps.elasticity", "--cpu", "--dim",
         "2", "--degree", "2", "--refine", "3", "--shards", "8", "--json"],
        capture_output=True, text=True, timeout=240, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["converged"]
    assert rec["l2_error"] < 5e-4
    assert "distributed" in rec["precond"]


def test_elasticity_cli_fast_tier():
    """--fast: the separable block tensor-product tier — same L2 error
    as the generic path (exact factorization)."""
    r = run(["tpufem.apps.elasticity", "--cpu", "--dim", "2", "--degree",
             "2", "--refine", "3", "--fast", "--json"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["converged"]
    assert rec["l2_error"] < 5e-4
    assert "fast tier" in rec["precond"]
