"""Offline abstract-tactile spec generator (reference P26,
envs/assets/dclaw_rotate/tactile/make_tactile.py): sample fingertip-mesh
vertices in a selection region and write the per-marker spec file
(``pos / image_pos / normal / axis0 / axis1`` quoted records) consumed by
``<tactile type="abstract" spec=...>`` scene declarations.

Improvements over the reference tool (documented deviations):
- no trimesh dependency — a minimal OBJ reader lives in
  tactilesimulation_tpu.model.assets;
- per-marker normals are estimated from the mesh faces (area-weighted vertex
  normals) instead of the hard-coded +y of the reference (:18), with tangent
  axes built per marker; pass ``--flat-normal`` for exact reference behavior.

Usage:
    python make_tactile.py mesh.obj out_tactile.txt \
        [--min-y 0.07] [--image-offset 0.01] [--image-scale 1000] \
        [--flat-normal]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("obj", help="input OBJ mesh")
    ap.add_argument("out", help="output tactile spec .txt")
    ap.add_argument("--min-y", type=float, default=0.07,
                    help="select vertices with y > this (reference :16)")
    ap.add_argument("--image-offset", type=float, default=0.01)
    ap.add_argument("--image-scale", type=float, default=1000.0)
    ap.add_argument("--flat-normal", action="store_true",
                    help="hard-code normal=+y, axes=+x/+z like the reference")
    args = ap.parse_args()

    from tactilesimulation_tpu.model.assets import load_obj_vertices_faces
    from tactilesimulation_tpu.model.assets import write_tactile_spec

    verts, faces = load_obj_vertices_faces(args.obj)
    sel = np.nonzero(verts[:, 1] > args.min_y)[0]
    if sel.size == 0:
        raise SystemExit(f"no vertices with y > {args.min_y} in {args.obj}")

    pos = verts[sel]
    # image coords: (x, z) shifted/scaled to integer pixel indices (ref :17)
    image_pos = ((pos[:, [0, 2]] + args.image_offset)
                 * args.image_scale).astype(np.int64)

    if args.flat_normal or faces is None:
        normal = np.tile([0.0, 1.0, 0.0], (sel.size, 1))
        axis0 = np.tile([1.0, 0.0, 0.0], (sel.size, 1))
        axis1 = np.tile([0.0, 0.0, 1.0], (sel.size, 1))
    else:
        # area-weighted vertex normals over all faces
        vn = np.zeros_like(verts)
        tri = verts[faces]                            # (F, 3, 3)
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        for k in range(3):
            np.add.at(vn, faces[:, k], fn)
        norms = np.linalg.norm(vn, axis=1, keepdims=True)
        vn = np.where(norms > 1e-12, vn / np.maximum(norms, 1e-12),
                      [0.0, 1.0, 0.0])
        normal = vn[sel]
        # tangent frame: axis0 = normalize(x - (x.n)n), fall back to z-cross
        ref = np.tile([1.0, 0.0, 0.0], (sel.size, 1))
        a0 = ref - np.sum(ref * normal, axis=1, keepdims=True) * normal
        bad = np.linalg.norm(a0, axis=1) < 1e-6
        a0[bad] = np.cross(normal[bad], [0.0, 0.0, 1.0])
        axis0 = a0 / np.linalg.norm(a0, axis=1, keepdims=True)
        axis1 = np.cross(normal, axis0)

    write_tactile_spec(args.out, pos, image_pos, normal, axis0, axis1)
    print(f"wrote {sel.size} markers -> {args.out}")


if __name__ == "__main__":
    main()
