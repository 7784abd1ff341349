"""Bundled task scenes — first-class Python constructions of the benchmark
scenes, so the framework is standalone (no reference checkout needed).

Scene parameters (geometry, stiffnesses, sensor layouts) are the physical
facts of the benchmark tasks, transcribed from the scene descriptions in
SURVEY.md §2.4; each constructor documents its exemplar. The XML front-end
(xml_parser.py) remains available for loading original redmax asset files,
and tests assert the bundled scenes build identical Structure/Model pairs.
"""

from __future__ import annotations

import numpy as np

from .scenes import SceneBuilder

_WSG_DEFAULT = dict(  # <default> block of the gripper scenes
    joint_lim_stiffness=10.0, joint_damping=2.0)


def _wsg50_gripper(b: SceneBuilder, base_joint="translational",
                   base_damping=2.0, rot_damping=0.2, finger="prismatic",
                   finger_damping=2.0, lim_stiffness=10.0,
                   pusher_layout=False):
    """WSG-50 gripper chain with two GelSlim tactile pads.

    Exemplars: stable_grasp.xml:15-48 (translational base + revolute +
    prismatic fingers), pusher.xml:15-36 (revolute base + planar, single
    finger). Mesh links are visual-only in the reference (no collision);
    they appear here as the same fallback-inertia bodies the XML path
    produces.
    """
    if pusher_layout:
        j_rot = b.add_joint("gripper_base_rotational", "revolute",
                            axis=(0, 0, 1), pos=(0.02, 0, 0.18), damping=2.0)
        b.add_body("gripper_base_virtual", j_rot, "cuboid",
                   size=(0.001, 0.001, 0.001), density=0.01)
        j_base = b.add_joint("gripper_base_translational", "planar",
                             parent=j_rot, axis=(1, 0, 0), axis1=(0, 1, 0),
                             damping=2.0)
        b.add_mesh_body("gripper_base", j_base, density=1000.0)
        sides = [("left", (0, 1, 0, 0), "fixed")]
        parent = j_base
    else:
        j_base = b.add_joint("gripper_base_translational", "translational",
                             damping=base_damping)
        b.add_body("gripper_base_virtual", j_base, "cuboid",
                   size=(0.001, 0.001, 0.001), density=0.01)
        j_rot = b.add_joint("gripper_base_rotational", "revolute",
                            parent=j_base, axis=(0, 0, 1), damping=rot_damping)
        b.add_mesh_body("gripper_base", j_rot, density=1.0)
        sides = [("left", (0, 1, 0, 0), finger), ("right", (0, 0, 1, 0), finger)]
        parent = j_rot

    pads = []
    for side, quat, ftype in sides:
        j_guide = b.add_joint(f"gripper_{side}_joint", ftype, parent=parent,
                              axis=(1, 0, 0), lim=(-0.055, 0.0), quat=quat,
                              damping=finger_damping,
                              lim_stiffness=lim_stiffness)
        b.add_mesh_body(f"gripper_{side}_guide", j_guide, density=1000.0)
        j_finger = b.add_joint(f"finger_{side}_joint", "fixed", parent=j_guide)
        b.add_mesh_body(f"finger_{side}", j_finger, density=1000.0)
        j_pad = b.add_joint(f"tactile_pad_{side}_joint", "fixed",
                            parent=j_finger, pos=(0.004, 0, 0.1472),
                            quat=(0.707, 0, 0.707, 0))
        pad = b.add_body(f"tactile_pad_{side}", j_pad, "cylinder",
                         size=(0.018, 0.003), density=1.0,
                         contact_angle_resolution=8,
                         contact_radius_resolution=4)
        pads.append((pad, j_pad))
    return pads


def _add_pad_sensor(b, name, pad_body, kn, kt, mu, damping):
    """13x10 GelSlim marker grid (pusher.xml:61, stable_grasp.xml:174-175)."""
    b.add_rect_tactile(name, pad_body,
                       rect_pos0=(0.007, 0.00675, 0.0015),
                       rect_pos1=(-0.011, -0.00675, 0.0015),
                       axis0=(-1, 0, 0), axis1=(0, -1, 0), rows=13, cols=10,
                       kn=kn, kt=kt, mu=mu, damping=damping)


def tactile_push():
    """TactilePush scene (exemplar: envs/assets/pusher/pusher.xml)."""
    b = SceneBuilder("wsg_50", integrator="BDF1", timestep=5e-3,
                     ground=(0, 0, 0))
    b.spec.solver_tol = 1e-8
    # chord budget: 6, from the round-3 multi-seed study
    # (bench_solver_accuracy.py -> artifacts/SOLVER_ACCURACY_r03.jsonl, f64,
    # 4 seeds, H=50): at 6 iterations trajectory rel-RMSE vs a 30-iteration
    # reference is 0.06% mean and the BPTT control-gradient cosine vs the
    # converged solver is 0.99998 (min 0.9999); at 4 the cosine drops to
    # 0.976 mean / 0.905 min — below the >=0.999 fidelity bar. (The FD
    # cross-check is chaos-noise-dominated at every budget incl. 10, so the
    # converged-gradient cosine is the operative metric.) Step cost is
    # linear in this number; bench.py --max-iter overrides it for A/B runs.
    b.spec.solver_max_iter = 6
    pads = _wsg50_gripper(b, pusher_layout=True)
    (pad_body, pad_joint) = pads[0]

    j_boxt = b.add_joint("box_translational_joint", "translational",
                         pos=(0.05, 0, 0.025))
    b.add_body("box_translational_joint", j_boxt, "cuboid",
               size=(0.001, 0.001, 0.001), density=0.01)
    j_box = b.add_joint("box", "revolute", parent=j_boxt, axis=(0, 0, 1))
    box = b.add_body("box", j_box, "cuboid", size=(0.05, 0.05, 0.05),
                     density=600.0, contact_resolution=(2, 2, 2))

    b.add_ground_contact(box, kn=1e3, kt=1.0, mu=0.8, damping=0.3)
    b.add_contact(pad_body, box, kn=1e2, kt=8.0, mu=1.0, damping=1e1)
    _add_pad_sensor(b, "tactile_pad_left", pad_body, kn=1e2, kt=8.0, mu=1.0,
                    damping=1e1)

    b.add_motor(b.spec.joint_index("gripper_base_translational"),
                ctrl="force", P=10, D=0.1, ctrl_range=(-1, 1))
    b.add_motor(b.spec.joint_index("gripper_base_rotational"),
                ctrl="force", P=10, D=0.1, ctrl_range=(-3, 3))
    b.add_motor(j_boxt, ctrl="force", P=10, D=0.1, ctrl_range=(-0.2, 0.2))

    b.add_endeffector("tactile_pad_left_joint", pad_joint,
                      pos=(-0.007, 0, 0))
    b.add_endeffector("box", j_box, pos=(-0.025, 0, 0))
    b.add_virtual("goal", pos=(1, 0, 0.025), size=(0.05, 0.05, 0.05))
    return b.build()


def stable_grasp():
    """StableGrasp scene (exemplar: envs/assets/stable_grasp/stable_grasp.xml):
    gripper + 11-block bar (free3d-euler root, fixed chain) + 2 tables."""
    b = SceneBuilder("wsg_50", integrator="BDF1", timestep=5e-3,
                     ground=(0, 0, 0))
    b.spec.solver_tol = 1e-8
    pads = _wsg50_gripper(b)

    # bar: box_4 root, boxes 3..1,8,9 on -y; 5..7,10,11 on +y
    j_root = b.add_joint("box_4", "free3d-euler", pos=(0, 0, 0.0525))
    blocks = {}
    blocks[4] = b.add_body("box_4", j_root, "cuboid",
                           size=(0.025, 0.025, 0.025), density=600.0,
                           contact_resolution=(3, 3, 2))
    chains = [(4, [3, 2, 1, 8, 9], -0.025), (4, [5, 6, 7, 10, 11], 0.025)]
    for root_id, chain, dy in chains:
        parent = j_root
        for bid in chain:
            j = b.add_joint(f"box_{bid}", "fixed", parent=parent,
                            pos=(0, dy, 0))
            blocks[bid] = b.add_body(f"box_{bid}", j, "cuboid",
                                     size=(0.025, 0.025, 0.025),
                                     density=600.0,
                                     contact_resolution=(3, 3, 2))
            parent = j

    tables = []
    for i, y in ((1, 0.1), (2, -0.1)):
        j = b.add_joint(f"table_{i}", "fixed", pos=(0, y, 0.02))
        tables.append(b.add_body(f"table_{i}", j, "cuboid",
                                 size=(0.05, 0.03, 0.04), density=1000.0,
                                 contact_resolution=(6, 6, 2)))

    for bid in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]:
        b.add_ground_contact(blocks[bid], kn=1e3, kt=1.0, mu=0.8,
                             damping=0.003)
    for (pad_body, _) in pads:
        for bid in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]:
            b.add_contact(pad_body, blocks[bid], kn=8e3, kt=80.0, mu=1.5,
                          damping=1e3)
    for t in tables:
        for bid in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]:
            b.add_contact(blocks[bid], t, kn=5e3, kt=5.0, mu=1.5, damping=1e2)

    b.add_motor(b.spec.joint_index("gripper_base_translational"),
                ctrl="position", P=400, D=1.0, ctrl_range=(-10, 10))
    b.add_motor(b.spec.joint_index("gripper_base_rotational"),
                ctrl="position", P=10, D=0.1, ctrl_range=(-2.6, 2.6))
    b.add_motor(b.spec.joint_index("gripper_left_joint"),
                ctrl="position", P=50, D=0.1, ctrl_range=(-2.6, 2.6))
    b.add_motor(b.spec.joint_index("gripper_right_joint"),
                ctrl="position", P=50, D=0.1, ctrl_range=(-2.6, 2.6))

    for (pad_body, _), name in zip(pads, ("tactile_pad_left",
                                          "tactile_pad_right")):
        _add_pad_sensor(b, name, pad_body, kn=250.0, kt=1.25, mu=1.5,
                        damping=25.0)
    return b.build()


def tactile_insertion():
    """TactileInsertion scene (exemplar:
    envs/assets/tactile_insertion/tactile_insertion.xml): gripper (force
    fingers) + free box + 4 hole walls."""
    b = SceneBuilder("wsg_50", integrator="BDF1", timestep=5e-3,
                     ground=(0, 0, 0))
    b.spec.solver_tol = 1e-8
    # tactile_insertion.xml:9 uses lim_stiffness default 5e2
    pads = _wsg50_gripper(b, finger_damping=20.0, lim_stiffness=5e2)

    j_box = b.add_joint("box", "free3d-euler", pos=(0, 0, 0.03))
    box = b.add_body("box", j_box, "cuboid", size=(0.035, 0.05, 0.06),
                     density=600.0, contact_resolution=(5, 5, 2))
    holes = []
    for name, pos, size, res in (
            ("hole_1", (0, 0.04725, 0.0125), (0.1195, 0.04, 0.025), (10, 2, 2)),
            ("hole_2", (0, -0.04725, 0.0125), (0.1195, 0.04, 0.025), (10, 2, 2)),
            ("hole_3", (0.03975, 0, 0.0125), (0.04, 0.0545, 0.025), (2, 5, 2)),
            ("hole_4", (-0.03975, 0, 0.0125), (0.04, 0.0545, 0.025), (2, 5, 2))):
        j = b.add_joint(name, "fixed", pos=pos)
        holes.append(b.add_body(name, j, "cuboid", size=size, density=1000.0,
                                contact_resolution=res))

    b.add_ground_contact(box, kn=1e3, kt=1.0, mu=0.8, damping=0.003)
    for (pad_body, _) in pads:
        b.add_contact(pad_body, box, kn=8e3, kt=80.0, mu=1.5, damping=1e3)
    for h in holes:
        b.add_contact(box, h, kn=5e3, kt=5.0, mu=1.5, damping=1e2)
        b.add_contact(h, box, kn=5e3, kt=5.0, mu=1.5, damping=1e2)

    b.add_motor(b.spec.joint_index("gripper_base_translational"),
                ctrl="position", P=200, D=1.0, ctrl_range=(-2.6, 2.6))
    b.add_motor(b.spec.joint_index("gripper_base_rotational"),
                ctrl="position", P=10, D=0.1, ctrl_range=(-2.6, 2.6))
    b.add_motor(b.spec.joint_index("gripper_left_joint"), ctrl="force",
                P=10, D=0.1, ctrl_range=(-20, 20))
    b.add_motor(b.spec.joint_index("gripper_right_joint"), ctrl="force",
                P=10, D=0.1, ctrl_range=(-20, 20))
    for (pad_body, _), name in zip(pads, ("tactile_pad_left",
                                          "tactile_pad_right")):
        _add_pad_sensor(b, name, pad_body, kn=250.0, kt=1.25, mu=1.5,
                        damping=25.0)
    return b.build()


def rolling_ball(resolution=200):
    """RollingBall dense-field scene (exemplar:
    assets/tactile_pad/tactile_pad.xml): force-controlled pad with a
    resolution^2 marker grid over a free sphere, BDF2."""
    b = SceneBuilder("tactile-pad", integrator="BDF2", timestep=5e-3,
                     ground=(0, 0, 0))
    j_pad = b.add_joint("pad_joint", "translational", pos=(0, 0, 0.06),
                        damping=1.0)
    pad = b.add_body("pad_body", j_pad, "cuboid", size=(0.05, 0.05, 0.01),
                     density=1000.0, contact_resolution=(20, 20, 20))
    j_obj = b.add_joint("object_joint", "free3d-exp", pos=(0, 0, 0.02))
    obj = b.add_body("object", j_obj, "sphere", size=(0.02,), density=1.0)

    b.add_ground_contact(obj, kn=5e3, kt=1.0, mu=0.8, damping=0.03)
    b.add_contact(pad, obj, kn=5.0, kt=1.0, mu=1.0, damping=1.0)
    b.add_motor(j_pad, ctrl="force", ctrl_range=(-1, 1))
    b.add_rect_tactile("pad", pad,
                       rect_pos0=(-0.025, 0.025, -0.005),
                       rect_pos1=(0.025, -0.025, -0.005),
                       axis0=(0, -1, 0), axis1=(1, 0, 0),
                       rows=resolution, cols=resolution,
                       kn=1.0, kt=0.01, mu=2.0, damping=0.003)
    return b.build()


def dclaw(n_tactile_per_finger=300, seed=0):
    """Procedural D'Claw cap-rotation scene.

    Capability-parity construction of the reference scene
    (envs/assets/dclaw_rotate/dclaw_position_control.xml): a 9-DoF
    three-finger claw (3 revolute joints per finger, same dof order and
    limits) above a fixed bottle with a revolute cap, abstract tactile
    sensors on each fingertip, and 4 endeffector markers. The reference's
    link geometry comes from meshes absent in this checkout, so links here
    are idealized cylinders and the fingertip tactile markers are sampled on
    a spherical cap (mirroring what make_tactile.py:14-22 does with mesh
    vertices); masses/inertias use the reference's published values.
    """
    rng = np.random.RandomState(seed)
    b = SceneBuilder("dclaw", integrator="BDF1", timestep=5e-3,
                     ground=(0, 0, -0.1))
    b.spec.solver_tol = 1e-8

    link_len = 0.0685
    tip_len = 0.0545
    link_r = 0.012
    finger_lims = [(-0.45, 1.35), (-2.0, 2.0), (-2.0, 2.0)]
    # reference masses: 0.093 kg links, 0.025 kg fingertip
    link_mass_density = 0.093 / (np.pi * link_r**2 * link_len)
    tip_density = 0.025 / (np.pi * link_r**2 * tip_len)

    j_base = b.add_joint("base_link", "fixed", pos=(0, 0, 0.25))
    b.add_body("base_link", j_base, "cylinder", size=(0.05, 0.02),
               density=0.12418 / (np.pi * 0.05**2 * 0.02))

    tip_bodies = []
    for fi, (fname, theta) in enumerate(
            [("one", np.pi / 3), ("two", -np.pi / 3), ("three", np.pi)]):
        c, s = np.cos(theta), np.sin(theta)
        # root: radial frame, local +y tangential, links extend along -z
        root_quat = (np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2))
        j0 = b.add_joint(f"{fname}0_jnt", "fixed", parent=j_base,
                         pos=(0.06 * c, 0.06 * s, -0.01), quat=root_quat)
        b.add_body(f"{fname}0_link", j0, "cylinder", size=(link_r, 0.02),
                   density=link_mass_density * 0.3)
        parent = j0
        for li in range(1, 4):
            pos = (0, 0, 0) if li == 1 else (0, 0, -link_len)
            j = b.add_joint(f"{fname}{li}_jnt", "revolute", parent=parent,
                            pos=pos, axis=(1, 0, 0), lim=finger_lims[li - 1],
                            damping=0.2, lim_stiffness=10.0)
            if li < 3:
                b.add_body(f"{fname}{li}_link", j, "cylinder",
                           size=(link_r, link_len), pos=(0, 0, -link_len / 2),
                           density=link_mass_density)
            else:
                # fingertip: cylinder body + explicit hemispherical contact
                # points and tactile markers at the tip
                tip = b.add_body(f"{fname}{li}_link", j, "cylinder",
                                 size=(link_r, tip_len),
                                 pos=(0, 0, -tip_len / 2),
                                 density=tip_density)
                tip_bodies.append((tip, j, fname))
            parent = j

    # fingertip hemisphere point cloud + tactile spec (body frame: cylinder
    # centered at (0,0,-tip_len/2), tip pole at z = -tip_len)
    def hemisphere(n, r, center_z):
        pts, nrm = [], []
        g = (1 + 5**0.5) / 2
        for i in range(n):
            zfrac = (i + 0.5) / n            # 0..1 over the lower hemisphere
            phi = np.arccos(-zfrac)           # polar from equator to pole
            az = 2 * np.pi * i / g
            d = np.array([np.sin(phi) * np.cos(az), np.sin(phi) * np.sin(az),
                          np.cos(phi)])
            pts.append(np.array([0, 0, center_z]) + r * d)
            nrm.append(d)
        return np.asarray(pts), np.asarray(nrm)

    from .schema import TactileSpec
    for tip, j_tip, fname in tip_bodies:
        pts, nrm = hemisphere(n_tactile_per_finger, link_r,
                              -tip_len + link_r * 0.2)
        body = b.spec.bodies[tip]
        # contact points: subsample the same hemisphere
        body.contact_points = pts[::6].copy()
        # tactile frame: axis0/axis1 tangent to the sphere
        a0 = np.cross(nrm, np.array([0.0, 0.0, 1.0]))
        bad = np.linalg.norm(a0, axis=1) < 1e-6
        a0[bad] = np.array([1.0, 0.0, 0.0])
        a0 /= np.linalg.norm(a0, axis=1, keepdims=True)
        a1 = np.cross(nrm, a0)
        image_pos = np.clip(((pts[:, :2] + 0.012) / 0.024 * 19), 0,
                            19).astype(np.int32)
        b.spec.tactiles.append(TactileSpec(
            name=f"{fname}3_link_fingertip", body=tip, pos=pts, normal=nrm,
            axis0=a0, axis1=a1, image_pos=image_pos, rows=20, cols=20,
            kn=1e3, kt=1.0, mu=1.2, damping=0.003))

    j_bottle = b.add_joint("bottle", "fixed", parent=-1, pos=(0, 0, 0.25 - 0.29),
                           damping=0.01)
    b.add_body("bottle", j_bottle, "cylinder", size=(0.04, 0.12),
               density=600.0)
    j_cap = b.add_joint("cap", "revolute", parent=j_bottle, axis=(0, 0, 1),
                        pos=(0, 0, 0.075), damping=0.01)
    cap = b.add_body("cap", j_cap, "cylinder", size=(0.04, 0.03),
                     density=600.0)

    for tip, j_tip, fname in tip_bodies:
        b.add_contact(tip, cap, kn=1e3, kt=5.0, mu=1.5, damping=1e2)

    for fname in ("one", "two", "three"):
        for li in range(1, 4):
            b.add_motor(b.spec.joint_index(f"{fname}{li}_jnt"),
                        ctrl="position", P=10.0, D=0.1,
                        ctrl_range=(-2.6, 2.6))

    for i, (tip, j_tip, fname) in enumerate(tip_bodies):
        b.add_endeffector(f"finger{i + 1}", j_tip, pos=(0, 0, -tip_len))
    b.add_endeffector("cap", j_cap, pos=(0.04, 0, 0))
    return b.build()
