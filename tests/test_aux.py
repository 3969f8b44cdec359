"""Auxiliary subsystems: SpMV baseline, VTU output, checkpoint, native lib,
timer/metrics (SURVEY.md §5)."""

import os

import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh


def test_ell_spmv_matches_csr():
    mesh = Mesh.hyper_cube(2, 3)
    dofs = DoFHandler(mesh, 3)
    K = assemble_laplace(dofs)
    from tpufem.ops.sparse import EllMatrix

    A = EllMatrix.from_csr(K, jnp.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dofs.n_dofs)
    y = np.asarray(A.matvec(jnp.asarray(x)))
    assert np.linalg.norm(y - K @ x) / np.linalg.norm(K @ x) < 1e-13


def test_vtu_writer(tmp_path):
    from tpufem.utils.output import write_vtu

    mesh = Mesh.hyper_cube(2, 2)
    dofs = DoFHandler(mesh, 2)
    u = np.sin(np.pi * dofs.dof_coords[:, 0])
    path = tmp_path / "sol.vtu"
    write_vtu(str(path), dofs, {"u": u})
    text = path.read_text()
    assert "VTKFile" in text and "UnstructuredGrid" in text
    assert f'NumberOfPoints="{dofs.n_dofs}"' in text
    # 4 sub-quads per Q2 cell
    assert f'NumberOfCells="{mesh.n_cells * 4}"' in text


def test_checkpoint_roundtrip(tmp_path):
    from tpufem.utils.output import load_checkpoint, save_checkpoint

    x = np.arange(10.0)
    save_checkpoint(str(tmp_path / "ck.npz"), x=x, it=np.int64(7))
    z = load_checkpoint(str(tmp_path / "ck.npz"))
    assert np.array_equal(z["x"], x)
    assert int(z["it"]) == 7


def test_native_matches_python_fallback():
    from tpufem.utils import native

    mesh = Mesh.hyper_cube(2, 2)
    centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
    mesh = mesh.refine(np.linalg.norm(centers, axis=1) < 0.6)
    dofs = DoFHandler(mesh, 2)
    try:
        cn = native.greedy_color(dofs.cell_dofs, dofs.n_dofs)
        fn = native.coarse_face_neighbors(mesh.origins, mesh.sizes, mesh.U)
        native_on = native.available()
    finally:
        pass
    os.environ["TPUFEM_NO_NATIVE"] = "1"
    try:
        cp = native.greedy_color(dofs.cell_dofs, dofs.n_dofs)
        fp = native.coarse_face_neighbors(mesh.origins, mesh.sizes, mesh.U)
    finally:
        del os.environ["TPUFEM_NO_NATIVE"]
    assert np.array_equal(cn, cp)
    assert np.array_equal(fn, fp)
    # if the toolchain is present, the native path must actually be active
    import shutil

    if shutil.which("g++"):
        assert native_on


def test_timer_sections():
    from tpufem.utils.timer import Timer

    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()


def test_metrics_jsonl(tmp_path):
    from tpufem.utils.metrics import emit

    path = tmp_path / "m.jsonl"
    emit({"metric": "x", "value": 1}, path=str(path))
    emit({"metric": "y", "value": 2}, path=str(path))
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    import json

    assert json.loads(lines[0])["metric"] == "x"
