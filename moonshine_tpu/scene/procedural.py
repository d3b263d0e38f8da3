"""Procedural benchmark scenes.

The driver's config ladder (BASELINE.md) references furnace / Cornell /
sphere / Salle-de-bain scenes; real assets can't be fetched in this
environment, so these generators produce workload-equivalent stand-ins:
`room_scene` builds an interior with textured walls, a grid of subdivided
spheres across every material type, and an emissive ceiling panel — tunable
from Cornell-box scale up to the ~1M-triangle class that stresses BVH
quality and traversal coherence.
"""

from __future__ import annotations

import numpy as np

from .types import (
    Geometry,
    Glass,
    Instance,
    Lambert,
    Lens,
    MaterialInfo,
    Mesh,
    Mirror,
    StandardPBR,
    scale_uniform,
    translate,
)
from .world import World


def _icosphere(subdivisions: int) -> tuple[np.ndarray, np.ndarray]:
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.asarray(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdivisions):
        cache, verts_list = {}, list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts_list[a]) + np.asarray(verts_list[b])) / 2
                verts_list.append(m / np.linalg.norm(m))
                cache[key] = len(verts_list) - 1
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)
    return verts.astype(np.float32), faces.astype(np.uint32)


def room_scene(grid: int = 4, subdivisions: int = 3, seed: int = 0,
               textured: bool = True):
    """Interior scene: (grid x grid) spheres of mixed materials in a box
    room with an emissive ceiling panel. Returns (World, Lens).

    Approximate triangle counts: subdivisions=3 -> 1.3k/sphere;
    grid=4, sub=3 ~ 20k tris; grid=8, sub=4 ~ 330k; grid=10, sub=4 ~ 510k.
    """
    rs = np.random.RandomState(seed)
    world = World()
    sphere_v, sphere_f = _icosphere(subdivisions)
    normals = sphere_v.copy()
    sphere = world.add_mesh(Mesh(positions=sphere_v, indices=sphere_f,
                                 normals=normals))

    quad = world.add_mesh(Mesh(
        positions=np.float32([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]]),
        indices=np.uint32([[0, 1, 2], [0, 2, 3]]),
        texcoords=np.float32([[0, 0], [6, 0], [6, 6], [0, 6]]),
    ))

    if textured:
        checker = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
        wall_tex = (0.3 + 0.5 * checker)[..., None] * np.float32([1, 0.9, 0.8])
        rough_tex = 0.3 + 0.6 * checker[..., None]
    else:
        wall_tex = (0.7, 0.7, 0.7)
        rough_tex = 0.8

    wall = world.add_material(MaterialInfo(
        variant=StandardPBR(color=wall_tex, metalness=0.0,
                            roughness=rough_tex)))
    light = world.add_material(MaterialInfo(
        variant=Lambert(color=(0, 0, 0)), emissive=(6.0, 6.0, 6.0)))

    half = grid * 1.6 / 2 + 2.0
    # floor, ceiling, back/left/right walls (instances of the quad)
    placements = [
        (np.float32([[half, 0, 0, 0], [0, half, 0, 0], [0, 0, 1, 0]]), wall),
        (np.float32([[half, 0, 0, 0], [0, -half, 0, 0], [0, 0, -1, 2 * half]]), wall),
        (np.float32([[half, 0, 0, 0], [0, 0, -half, half], [0, 1, 0, half]]), wall),
        (np.float32([[0, 0, half, -half], [half, 0, 0, 0], [1, 0, 0, half]]), wall),
        (np.float32([[0, 0, -half, half], [-half, 0, 0, 0], [1, 0, 0, half]]), wall),
    ]
    for transform, mat in placements:
        world.add_instance(Instance(transform=transform,
                                    geometries=[Geometry(quad, mat)]))
    # emissive ceiling panel (slightly below the ceiling, facing down)
    world.add_instance(Instance(
        transform=np.float32([[half * 0.4, 0, 0, 0],
                              [0, -half * 0.4, 0, 0],
                              [0, 0, -1, 2 * half - 0.01]]),
        geometries=[Geometry(quad, light, sampled=True)],
    ))

    variants = [
        lambda: Lambert(color=tuple(0.2 + 0.7 * rs.rand(3))),
        lambda: StandardPBR(color=tuple(0.3 + 0.6 * rs.rand(3)),
                            metalness=float(rs.rand()),
                            roughness=float(0.1 + 0.8 * rs.rand())),
        lambda: Mirror(),
        lambda: Glass(ior=1.45 + 0.2 * float(rs.rand())),
    ]
    spacing = 1.6
    offset = (grid - 1) * spacing / 2
    for i in range(grid):
        for j in range(grid):
            mat = world.add_material(
                MaterialInfo(variant=variants[(i * grid + j) % 4]()))
            radius = 0.55 + 0.2 * rs.rand()
            world.add_instance(Instance(
                transform=scale_uniform(
                    radius,
                    (i * spacing - offset, j * spacing - offset, radius),
                ),
                geometries=[Geometry(sphere, mat)],
            ))

    sky = np.zeros((8, 16, 3), np.float32)
    sky[:4] = [0.3, 0.4, 0.6]
    world.set_background(sky)

    lens = Lens(
        origin=np.float32([0, -half + 0.5, half * 0.8]),
        forward=np.float32([0, 1.0, -0.35]) / np.linalg.norm([0, 1.0, -0.35]),
        up=np.float32([0, 0, 1]),
        vfov=np.pi / 3,
    )
    return world, lens
