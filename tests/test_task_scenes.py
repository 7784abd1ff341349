"""Bundled Python task scenes must build models physically identical to the
reference XML assets (standalone-framework guarantee)."""

import numpy as np
import pytest

from tactilesimulation_tpu.model import builder, task_scenes, xml_parser

from conftest import reference_scene

CASES = [
    (task_scenes.tactile_push, "envs/assets/pusher/pusher.xml"),
    (task_scenes.stable_grasp, "envs/assets/stable_grasp/stable_grasp.xml"),
    (task_scenes.tactile_insertion,
     "envs/assets/tactile_insertion/tactile_insertion.xml"),
    (task_scenes.rolling_ball, "assets/tactile_pad/tactile_pad.xml"),
]


@pytest.mark.parametrize("bundled_fn,xml_rel", CASES)
def test_bundled_scene_matches_xml(bundled_fn, xml_rel):
    s1, m1 = bundled_fn()
    spec = xml_parser.parse_scene(reference_scene(xml_rel))
    s2, m2 = builder.build(spec)

    assert s1.ndof_q == s2.ndof_q
    assert s1.ndof_u == s2.ndof_u
    assert s1.ndof_var == s2.ndof_var
    assert s1.ndof_tactile == s2.ndof_tactile
    assert s1.joint_types == s2.joint_types
    assert s1.joint_parents == s2.joint_parents
    assert s1.joint_names == s2.joint_names
    assert s1.body_names == s2.body_names
    assert s1.motor_dof == s2.motor_dof
    assert s1.integrator == s2.integrator
    assert len(s1.pairs) == len(s2.pairs)

    for name in ("joint_pos", "joint_quat", "joint_axis0", "dof_damping",
                 "dof_lim_lower", "dof_lim_upper", "dof_lim_stiffness",
                 "body_mass", "body_inertia", "body_size", "body_pos",
                 "motor_kp", "motor_kd", "motor_ctrl_lo", "motor_ctrl_hi",
                 "motor_pos_mask", "cp_pos", "pair_kn", "pair_kt", "pair_mu",
                 "pair_damping", "tac_pos", "tac_normal", "tac_axis0",
                 "tac_axis1", "tac_kn", "tac_kt", "tac_mu", "tac_damping",
                 "ee_pos", "gravity", "h", "ground_pos", "ground_normal"):
        a = np.asarray(getattr(m1, name))
        b = np.asarray(getattr(m2, name))
        np.testing.assert_allclose(
            a, b, atol=1e-12, err_msg=f"{xml_rel}: Model.{name} differs")
