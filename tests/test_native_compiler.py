"""Cross-validate the native (C++) model compiler against the Python
front-end on every reference scene: counts, dof layout, masses, point clouds,
tactile markers must agree."""

import numpy as np
import pytest

from tactilesimulation_tpu.model import builder, native, xml_parser

from conftest import reference_scene

SCENES = [
    "envs/assets/pusher/pusher.xml",
    "envs/assets/stable_grasp/stable_grasp.xml",
    "envs/assets/tactile_insertion/tactile_insertion.xml",
    "envs/assets/dclaw_rotate/dclaw_position_control.xml",
    "assets/tactile_pad/tactile_pad.xml",
]


@pytest.fixture(scope="module")
def lib_built():
    native.build_native()


@pytest.mark.parametrize("rel", SCENES)
def test_native_matches_python(rel, lib_built):
    path = reference_scene(rel)
    nm = native.compile_scene(path)
    spec = xml_parser.parse_scene(path)
    struct, model = builder.build(spec)

    assert nm.ndof == struct.ndof_q
    assert nm.njoints == struct.njoints
    assert nm.nbodies == struct.nbodies
    assert nm.nmarkers == struct.ndof_tactile // 3
    assert nm.npairs == len(struct.pairs)
    assert tuple(nm.joint_names) == struct.joint_names
    assert tuple(nm.body_names) == struct.body_names
    assert tuple(nm.joint_type.tolist()) == struct.joint_types
    assert tuple(nm.joint_parent.tolist()) == struct.joint_parents
    assert np.isclose(nm.timestep, float(model.h))
    assert nm.integrator == struct.integrator

    np.testing.assert_allclose(nm.joint_pos.reshape(-1, 3),
                               np.asarray(model.joint_pos), atol=1e-12)
    np.testing.assert_allclose(nm.body_mass, np.asarray(model.body_mass),
                               rtol=1e-9)
    np.testing.assert_allclose(nm.body_inertia.reshape(-1, 3),
                               np.asarray(model.body_inertia), rtol=1e-9)
    np.testing.assert_allclose(nm.body_pos.reshape(-1, 3),
                               np.asarray(model.body_pos), atol=1e-9)
    np.testing.assert_allclose(nm.body_size.reshape(-1, 3),
                               np.asarray(model.body_size), atol=1e-12)
    # contact point clouds (joint frame) — same generation algorithms
    assert nm.npoints == len(struct.cp_joint)
    np.testing.assert_allclose(nm.cp_pos.reshape(-1, 3),
                               np.asarray(model.cp_pos), atol=1e-9)
    # tactile markers
    np.testing.assert_allclose(nm.tac_pos.reshape(-1, 3),
                               np.asarray(model.tac_pos), atol=1e-9)
    np.testing.assert_allclose(nm.tac_normal.reshape(-1, 3),
                               np.asarray(model.tac_normal), atol=1e-9)
    # motors expand per-dof in the python builder; native keeps per-motor
    ndof_u = sum({0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 6, 6: 6}[
        int(nm.joint_type[j])] for j in nm.motor_joint)
    assert ndof_u == struct.ndof_u
