"""Shared geometry fixtures (parity: the icosphere generator that is the
reference test suite's only fixture, engine/tests.zig:115-247)."""

import numpy as np

from moonshine_tpu.scene.types import Mesh


def icosphere(subdivisions=3, radius=1.0, reverse_winding=False,
              with_normals=True):
    """Subdivided icosahedron; vertex normals point outward (or the winding
    is reversed for interior scenes, tests.zig reversed option)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )

    for _ in range(subdivisions):
        cache = {}
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                m /= np.linalg.norm(m)
                verts.append(m)
                cache[key] = len(verts) - 1
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.asarray(verts)
        faces = np.asarray(new_faces, np.int64)

    if reverse_winding:
        faces = faces[:, [0, 2, 1]]

    normals = verts.copy()
    positions = (verts * radius).astype(np.float32)
    return Mesh(
        positions=positions,
        indices=faces.astype(np.uint32),
        normals=normals.astype(np.float32) if with_normals else None,
    )
