"""Tests for host-side tooling: OBJ reader, tactile-spec writer/reader
roundtrip (the make_tactile generator path, reference P26), profiling."""

import numpy as np

from tactilesimulation_tpu.model import assets
from tactilesimulation_tpu.utils import profiling


def test_obj_reader_and_spec_roundtrip(tmp_path):
    # tiny OBJ: a quad above y=0.07 (fan-triangulated) + one vertex below
    obj = tmp_path / "tip.obj"
    obj.write_text(
        "v 0.0 0.08 0.0\n"
        "v 0.01 0.08 0.0\n"
        "v 0.01 0.08 0.01\n"
        "v 0.0 0.08 0.01\n"
        "v 0.0 0.0 0.0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n")
    verts, faces = assets.load_obj_vertices_faces(str(obj))
    assert verts.shape == (5, 3)
    assert faces.shape == (2, 3)  # quad -> 2 triangles

    sel = verts[:, 1] > 0.07
    pos = verts[sel]
    m = pos.shape[0]
    image_pos = ((pos[:, [0, 2]] + 0.01) * 1000).astype(np.int64)
    normal = np.tile([0.0, 1.0, 0.0], (m, 1))
    axis0 = np.tile([1.0, 0.0, 0.0], (m, 1))
    axis1 = np.tile([0.0, 0.0, 1.0], (m, 1))
    spec_path = tmp_path / "tactile.txt"
    assets.write_tactile_spec(str(spec_path), pos, image_pos, normal,
                              axis0, axis1)

    spec = assets.load_tactile_spec(str(spec_path))
    assert spec["pos"].shape == (4, 3)
    np.testing.assert_allclose(spec["pos"], pos)
    np.testing.assert_array_equal(spec["image_pos"], image_pos)
    np.testing.assert_allclose(spec["normal"], normal)

    # format parity with the reference exemplar: count line + 5 quoted fields
    lines = spec_path.read_text().strip().splitlines()
    assert lines[0] == "4"
    assert lines[1].count('"') == 10


def test_make_tactile_tool(tmp_path):
    import subprocess
    import sys
    obj = tmp_path / "tip.obj"
    obj.write_text(
        "v 0.0 0.08 0.0\nv 0.01 0.08 0.0\nv 0.01 0.08 0.01\n"
        "v 0.0 0.0 0.0\nf 1 2 3\n")
    out = tmp_path / "spec.txt"
    r = subprocess.run(
        [sys.executable, "examples/DClawExp/make_tactile.py",
         str(obj), str(out), "--flat-normal"],
        cwd="/root/repo", capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    spec = assets.load_tactile_spec(str(out))
    assert spec["pos"].shape == (3, 3)
    np.testing.assert_allclose(spec["normal"], [[0, 1, 0]] * 3)


def test_phase_timer():
    import jax.numpy as jnp
    pt = profiling.PhaseTimer()
    with pt.phase("work") as box:
        box["sync"] = jnp.ones(8) * 2
    with pt.phase("work"):
        pass
    rep = pt.report()
    assert rep["work"]["calls"] == 2
    assert rep["work"]["total_s"] > 0

    class W:
        logged = {}

        def add_scalar(self, tag, val, step):
            self.logged[tag] = (val, step)

    w = W()
    pt.log_to(w, step=3)
    assert "profile/work_mean_s" in w.logged
