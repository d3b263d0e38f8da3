"""Resort off/on A/B across the three VMEM ladder rungs (exact ladder
configs) to decide the auto rule for VMEM-resident scenes."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from fixtures import icosphere
from glb_builder import cornell_box_glb
from dataclasses import replace
from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.scene import gltf
from moonshine_tpu.scene.types import (
    Geometry, Glass, Instance, Lambert, Lens, MaterialInfo, Mesh,
    Mirror, identity_transform, translate,
)
from moonshine_tpu.scene.world import World
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render.renderer import render_spp


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def rungs():
    lens = Lens(origin=np.float32([0, -3, 0]), forward=np.float32([0, 1, 0]),
                up=np.float32([0, 0, 1]), vfov=np.pi / 4)

    w = World()
    mesh = w.add_mesh(icosphere(3, with_normals=False))
    mat = w.add_material(MaterialInfo(variant=Lambert(color=(1, 1, 1))))
    w.add_instance(Instance(transform=identity_transform(),
                            geometries=[Geometry(mesh, mat)]))
    w.set_background(None)
    yield ("furnace", w.build(), lens, (256, 256),
           PathConfig(max_bounces=16, env_samples_per_bounce=0,
                      mesh_samples_per_bounce=0, unroll=False))

    world = gltf.world_from_glb(cornell_box_glb())
    world.set_background(np.zeros((4, 8, 3), np.float32))
    clens = gltf.lens_from_glb(cornell_box_glb())
    yield ("cornell", world.build(), clens, (512, 512),
           PathConfig(max_bounces=4, env_samples_per_bounce=0,
                      mesh_samples_per_bounce=1))

    w = World()
    sphere = w.add_mesh(icosphere(4))
    floor = w.add_mesh(Mesh(
        positions=np.float32([[-20, -20, -1], [20, -20, -1],
                              [20, 20, -1], [-20, 20, -1]]),
        indices=np.uint32([[0, 1, 2], [0, 2, 3]])))
    mats = [w.add_material(MaterialInfo(variant=Mirror())),
            w.add_material(MaterialInfo(variant=Glass(ior=1.5))),
            w.add_material(MaterialInfo(variant=Lambert(color=(0.6, 0.6, 0.6))))]
    for x, m in [(-1.5, 0), (1.5, 1)]:
        w.add_instance(Instance(transform=translate(x, 0, 0),
                                geometries=[Geometry(sphere, mats[m])]))
    w.add_instance(Instance(transform=identity_transform(),
                            geometries=[Geometry(floor, mats[2])]))
    sky = np.zeros((64, 128, 3), np.float32)
    sky[:, :, :] = 0.2
    sky[8:16, 20:40] = 12.0
    w.set_background(sky, size=64)
    yield ("mirror_glass", w.build(), lens, (512, 512),
           PathConfig(max_bounces=8, env_samples_per_bounce=1,
                      mesh_samples_per_bounce=0))


def main():
    SPP = 4
    for name, scene, lens, (h, wdt), cfg in rungs():
        la = LensArrays.from_lens(lens)
        for resort in (False, True):
            c = replace(cfg, resort_bounces=resort)
            img, rays = render_spp(scene, la, h, wdt, 0, SPP, c)
            img.block_until_ready()
            t0 = time.perf_counter()
            img2, rays = render_spp(scene, la, h, wdt, SPP, SPP, c)
            img2.block_until_ready()
            dt = time.perf_counter() - t0
            print(f"{name:14s} resort={int(resort)}: "
                  f"{dt/SPP*1e3:8.2f} ms/sample  "
                  f"{float(rays)/dt/1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
