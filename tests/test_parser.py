"""Model-compiler oracle tests: parse every reference scene and check the
dof counts pinned by the reference env code (SURVEY.md §2.3 C2 call sites)."""

import numpy as np
import pytest

from tactilesimulation_tpu.model import builder, xml_parser

from conftest import reference_scene

SCENES = {
    # path -> (ndof_q, ndof_u, ndof_var, n_tactile_markers)
    # pusher: revolute+planar gripper (3) + translational+revolute box (4)
    # (tactile_push_env.py q layout comments; 13x10 pad -> 130 markers)
    "envs/assets/pusher/pusher.xml": (7, 6, 6, 130),
    # stable grasp: 3+1+1+1 gripper + free3d-euler bar (6) = 12; 4 position
    # motors over (3,1,1,1) dofs = 6; two 13x10 pads
    "envs/assets/stable_grasp/stable_grasp.xml": (12, 6, 0, 260),
    # insertion: same gripper + free3d-euler box = 12
    "envs/assets/tactile_insertion/tactile_insertion.xml": (12, 6, 0, 260),
    # dclaw: 9 revolute fingers + cap = 10; 9 position motors; 4 endeffectors
    "envs/assets/dclaw_rotate/dclaw_position_control.xml": (10, 9, 12, 3 * 302),
    # rolling ball: translational pad (3) + free3d-exp sphere (6) = 9
    # (test_sim_speed.py:54 "which is 9 in this case"); 200x200 pad
    "assets/tactile_pad/tactile_pad.xml": (9, 3, 0, 40000),
}


@pytest.mark.parametrize("rel,expected", SCENES.items())
def test_reference_scene_dofs(rel, expected):
    spec = xml_parser.parse_scene(reference_scene(rel))
    ndof_q, ndof_u, ndof_var, n_markers = expected
    assert spec.ndof_q == ndof_q
    assert spec.ndof_u == ndof_u
    assert spec.ndof_var == ndof_var
    assert spec.ndof_tactile == 3 * n_markers


def test_builder_shapes_pusher():
    spec = xml_parser.parse_scene(reference_scene("envs/assets/pusher/pusher.xml"))
    struct, model = builder.build(spec)
    assert struct.ndof_q == 7 and struct.ndof_u == 6
    assert model.q_init.shape == (7,)
    assert model.tac_pos.shape == (130, 3)
    # box contact points: 2x2x2 lattice -> 8 corners
    box = struct.body_index("box")
    pair = [p for p in struct.pairs if p.general_body == box][0]
    assert pair.point_count == 8
    # tactile pad cylinder: 8 angles x 4 radii + center, both faces
    pad = struct.body_index("tactile_pad_left")
    pad_pair = [p for p in struct.pairs if p.general_body == pad][0]
    assert pad_pair.point_count == 2 * (1 + 8 * 4)
    # motors: planar(2) + revolute(1) + translational(3), document order
    assert struct.motor_dof == (1, 2, 0, 3, 4, 5)
    # tactile pair: pad markers vs box
    assert len(struct.tactile_pairs) == 1
    assert struct.tactile_pairs[0].point_count == 130
    # 13x10 grid geometry: spacing uniform, z on pad face
    pos = np.asarray(model.tac_pos)
    assert pos.shape == (130, 3)
    assert np.allclose(pos[:, 2], pos[0, 2])


def test_builder_dclaw_structure():
    spec = xml_parser.parse_scene(
        reference_scene("envs/assets/dclaw_rotate/dclaw_position_control.xml"))
    struct, model = builder.build(spec)
    assert struct.ndof_q == 10
    assert len(struct.sensors) == 3
    for s in struct.sensors:
        assert (s.rows, s.cols) == (20, 20)
        assert s.marker_count == 302
    # abstract bodies carry explicit mass
    bl = struct.body_index("base_link")
    assert np.isclose(float(model.body_mass[bl]), 0.12418)
    # cap: revolute joint, cylinder geometry [radius, half_len]
    cap = struct.body_index("cap")
    assert np.allclose(np.asarray(model.body_size[cap])[:2], [0.04, 0.015])


def test_builder_stable_grasp_limits_and_motors():
    spec = xml_parser.parse_scene(
        reference_scene("envs/assets/stable_grasp/stable_grasp.xml"))
    struct, model = builder.build(spec)
    # gripper prismatic fingers limited to [-0.055, 0]
    names = struct.joint_names
    li = struct.joint_index("gripper_left_joint")
    off = struct.joint_dof_offset[li]
    assert np.isclose(float(model.dof_lim_lower[off]), -0.055)
    assert np.isclose(float(model.dof_lim_upper[off]), 0.0)
    # all 4 motors are position control over 6 dofs
    assert np.all(np.asarray(model.motor_pos_mask) == 1.0)
    # 55 declared contact pairs: 11 ground + 22 pad-box + 22 box-table
    assert len(struct.pairs) == 55
    # tactile pads contact 11 boxes each -> 22 tactile pairs
    assert len(struct.tactile_pairs) == 22
