"""Synthetic COCO dataset generation (domain-randomized scenes).

CLI parity with the reference's coco_data_generator.py (BlenderProc pipeline,
~20 argparse flags at :398-524): renders multi-object scenes with OUR
renderer and writes images/, aux/ (depth + instance seg), annotations.json
(COCO, with optional contiguous category remapping) and poses.json (6-DoF
labels). Optional Canny edge maps per image.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--out-dir", type=str, default="coco_out")
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--views-per-scene", type=int, default=25)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--min-objects", type=int, default=2)
    p.add_argument("--max-objects", type=int, default=5)
    p.add_argument("--material-mode",
                   choices=["vertex", "uniform", "texture", "random"],
                   default="random")
    p.add_argument("--placement", choices=["rest", "physics"],
                   default="rest",
                   help="'physics' drops objects and adopts the settled "
                        "rigid-body poses (the reference's Blender physics "
                        "step); 'rest' is the fast bbox-on-plane pose")
    p.add_argument("--edge-maps", action="store_true")
    p.add_argument("--room", action="store_true",
                   help="enclose every scene in a floor+4-wall room with "
                        "per-scene randomized material (the reference's 2 m "
                        "BlenderProc room)")
    p.add_argument("--min-visible-px", type=int, default=0,
                   help="visibility-checked cameras: re-sample views until "
                        ">=1 instance has this many visible pixels, and "
                        "guarantee every written annotation has >= this "
                        "many (the reference's BVH camera check analog)")
    p.add_argument("--no-normals", action="store_true",
                   help="skip the normals pass (saves a third of the "
                        "device->host transfer volume)")
    p.add_argument("--no-pack", action="store_true",
                   help="keep float32 outputs instead of the compact "
                        "u8/u16/i8 on-device packing")
    p.add_argument("--mesh-shape", type=str, default=None,
                   help="'d,m' device-mesh shape: shard each render chunk's "
                        "view axis over the 'data' axis (bit-exact; "
                        "d*m must equal the device count)")
    p.add_argument("--reformat", action="store_true",
                   help="remap category ids to contiguous 1..N (detectron2)")
    p.add_argument("--objs", type=str, nargs="*", default=None,
                   help="OBJ model paths for the object library "
                        "(default: built-in primitives)")
    p.add_argument("--instances", type=str, default=None,
                   help="model directory with the reference's "
                        "instances.json layout (categories with id/name/"
                        "filename/supercategory); overrides --objs")
    p.add_argument("--load-textures", action="store_true",
                   help="ingest the OBJs' own MTL/UV textures: textured "
                        "scenes render each model with its real map")
    p.add_argument("--texture-dir", type=str, default=None,
                   help="directory of texture image files: textured scenes "
                        "draw object/room materials from these (the "
                        "reference's random texture folder)")
    p.add_argument("--distractor-objs", type=str, nargs="*", default=None,
                   help="OBJ paths rendered as occluding, non-annotated "
                        "distractors (the reference's BOP distractor mix)")
    p.add_argument("--distractors", type=str, default=None,
                   help="min,max distractors per scene (default 0,0; with "
                        "--distractor-objs and no explicit value: "
                        "1,len(library))")
    args = p.parse_args()
    setup_platform(args)

    import json
    import os

    import numpy as np

    from torch_renderer_tpu.datagen.coco import (
        COCODataGenerator, DataGenConfig, ObjectLibrary,
        reformat_coco_annotations,
    )

    if args.instances:
        library = ObjectLibrary.from_instances_json(
            args.instances, load_textures=args.load_textures)
    elif args.objs:
        library = ObjectLibrary.from_obj_files(
            args.objs, load_textures=args.load_textures)
    else:
        library = ObjectLibrary.primitives()
    distractor_library = None
    if args.distractor_objs:
        distractor_library = ObjectLibrary.from_obj_files(
            args.distractor_objs, load_textures=args.load_textures)
    if args.distractors is None:
        # auto-default only when the flag was NOT given: an explicit
        # "--distractors 0,0" with --distractor-objs means "load the
        # libraries but place zero distractors this run" and is honored
        if args.distractor_objs:
            d_lo, d_hi = 1, max(1, len(distractor_library.entries))
            print(f"--distractors not given: defaulting to {d_lo},{d_hi}")
        else:
            d_lo, d_hi = 0, 0
    else:
        d_lo, d_hi = (int(x) for x in args.distractors.split(","))

    cfg = DataGenConfig(
        image_size=(args.height, args.width),
        views_per_scene=args.views_per_scene,
        objects_per_scene=(args.min_objects, args.max_objects),
        distractors_per_scene=(d_lo, d_hi),
        material_mode=args.material_mode,
        texture_dir=args.texture_dir,
        placement_mode=args.placement,
        edge_maps=args.edge_maps,
        normal_maps=not args.no_normals,
        pack_outputs=not args.no_pack,
        room=args.room,
        min_visible_px=args.min_visible_px,
    )
    device_mesh = None
    if args.mesh_shape:
        from torch_renderer_tpu.parallel.mesh import make_mesh

        shape = tuple(int(s) for s in args.mesh_shape.split(","))
        device_mesh = make_mesh(shape)
        print(f"device mesh {dict(device_mesh.shape)} over "
              f"{len(device_mesh.devices.flat)} devices")
    gen = COCODataGenerator(library, cfg, device_mesh=device_mesh,
                            distractor_library=distractor_library)

    t0 = time.perf_counter()
    coco = gen.generate(args.out_dir, args.scenes,
                        rng=np.random.default_rng(args.seed))
    elapsed = time.perf_counter() - t0
    n_imgs = len(coco["images"])
    print(f"rendered {n_imgs} rgbd images ({args.scenes} scenes) in "
          f"{elapsed:.1f}s = {elapsed / max(args.scenes, 1):.2f}s/scene, "
          f"{len(coco['annotations'])} annotations")

    if args.reformat:
        out = reformat_coco_annotations(coco)
        path = os.path.join(args.out_dir, "annotations_contiguous.json")
        with open(path, "w") as f:
            json.dump(out, f)
        print("saved", path)


if __name__ == "__main__":
    main()
