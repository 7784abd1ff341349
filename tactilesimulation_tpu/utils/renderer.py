"""Offline trajectory renderer — replaces the reference's interactive OpenGL
replay viewer (SURVEY.md C11, utils/renderer.py P18) with a headless
matplotlib 3D renderer: draw primitive bodies along a recorded q-trajectory,
write numbered PNG frames, and assemble a GIF (ffmpeg-free; pillow writer).

Usage:
    SimRenderer.replay(sim, record=True, record_path="out.gif")    # facade
    render_trajectory(struct, model, qs, path)                     # functional
"""

from __future__ import annotations

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ..model.schema import (  # noqa: E402
    GEOM_ABSTRACT, GEOM_CUBOID, GEOM_CYLINDER, GEOM_MESH, GEOM_SPHERE)


def _draw_body(ax, gtype, size, p, R, color):
    if gtype == GEOM_CUBOID or gtype == GEOM_MESH or gtype == GEOM_ABSTRACT:
        h = np.asarray(size) / 2.0
        corners = np.array([[sx * h[0], sy * h[1], sz * h[2]]
                            for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)])
        pts = corners @ R.T + p
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
                 (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            ax.plot(*zip(pts[a], pts[b]), color=color, lw=0.8)
    elif gtype == GEOM_CYLINDER:
        r, hl = size[0], size[1]
        th = np.linspace(0, 2 * np.pi, 17)
        for z in (-hl, hl):
            ring = np.stack([r * np.cos(th), r * np.sin(th),
                             np.full_like(th, z)], axis=-1) @ R.T + p
            ax.plot(ring[:, 0], ring[:, 1], ring[:, 2], color=color, lw=0.8)
    elif gtype == GEOM_SPHERE:
        r = size[0]
        th = np.linspace(0, 2 * np.pi, 17)
        for axes in ((0, 1), (0, 2), (1, 2)):
            ring = np.zeros((17, 3))
            ring[:, axes[0]] = r * np.cos(th)
            ring[:, axes[1]] = r * np.sin(th)
            ring = ring @ R.T + p
            ax.plot(ring[:, 0], ring[:, 1], ring[:, 2], color=color, lw=0.8)


def render_frame(struct, model, q, ax=None, lim=0.3, camera=None):
    """``camera``: optional (camera_pos, camera_lookat) pair — honored by
    setting the 3D view direction + centering, mirroring the reference
    viewer_options.camera_pos/camera_lookat (SURVEY.md C11)."""
    from ..sim import kinematics, spatial
    import jax.numpy as jnp

    own_fig = ax is None
    if own_fig:
        fig = plt.figure(figsize=(5, 5), dpi=80)
        ax = fig.add_subplot(projection="3d")
    p, quat = kinematics.fk_bodies(struct, model, jnp.asarray(q))
    p = np.asarray(p)
    R = np.asarray(spatial.quat_to_mat(quat))
    sizes = np.asarray(model.body_size)
    rgba = np.asarray(model.body_rgba)
    for b in range(struct.nbodies):
        _draw_body(ax, struct.body_gtype[b], sizes[b], p[b], R[b],
                   tuple(np.clip(rgba[b, :3], 0, 1)))
    center = np.zeros(3)
    if camera is not None:
        pos = np.asarray(camera[0], float)
        lookat = np.asarray(camera[1], float)
        center = lookat
        d = pos - lookat
        ax.view_init(
            elev=float(np.degrees(np.arctan2(d[2], np.hypot(d[0], d[1])))),
            azim=float(np.degrees(np.arctan2(d[1], d[0]))))
    ax.set_xlim(center[0] - lim, center[0] + lim)
    ax.set_ylim(center[1] - lim, center[1] + lim)
    ax.set_zlim(center[2], center[2] + 2 * lim)
    return ax.figure if own_fig else None


def render_trajectory(struct, model, qs, path, fps=30, every=1, lim=0.3,
                      camera=None, speed=1.0, loop=False):
    """qs (T, ndof) -> numbered PNGs (path is a folder) or an animated GIF
    (path endswith .gif). ``speed`` scales playback rate and ``loop`` makes
    the GIF repeat — the reference viewer_options.speed/.loop knobs."""
    qs = np.asarray(qs)[::every]
    frames = []
    for i, q in enumerate(qs):
        fig = render_frame(struct, model, q, lim=lim, camera=camera)
        fig.canvas.draw()
        frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
        plt.close(fig)
    if path.endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # PIL GIF: loop=0 means repeat forever; to play ONCE the parameter
        # must be omitted entirely (loop=1 would play twice)
        kw = {"loop": 0} if loop else {}
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / (fps * max(speed, 1e-6))), **kw)
    else:
        os.makedirs(path, exist_ok=True)
        from PIL import Image
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(path, f"{i}.png"))
    return len(frames)


class SimRenderer:
    """Facade-compatible replay (reference utils/renderer.py:7-30)."""

    @staticmethod
    def replay(sim, record=False, record_path="replay.gif"):
        qs = sim.export_trajectory()
        vo = sim.viewer_options
        if record and len(qs):
            render_trajectory(sim.struct, sim.model, qs, record_path,
                              fps=vo.fps, speed=vo.speed, loop=vo.loop,
                              camera=(vo.camera_pos, vo.camera_lookat))
