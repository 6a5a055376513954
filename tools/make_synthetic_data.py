#!/usr/bin/env python
"""Generate a synthetic crop store on disk.

The datasets are external downloads in the reference (README Usage); this
writes a store with the exact on-disk layout the loaders expect
({root}/{obj}/{frame}/pts_xyz.bin [+ img_crop.bin] + objects.pkl index), so
the full pipeline — including the native C++ loader — runs without data
access. Generalizes the reference's FakeCompleteLoader mock pattern
(object_loader_base.py:499-504) into a first-class fixture generator.

    python tools/make_synthetic_data.py /tmp/store --objects 200 --images
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--objects", type=int, default=100)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--images", action="store_true")
    ap.add_argument("--crop-size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset", default="nuscenes",
                    choices=["nuscenes", "waymo"])
    args = ap.parse_args(argv)

    from point_cloud_reid_tpu.configs.datasets import (NUSCENES_CLASSES,
                                                       WAYMO_CLASSES)
    from point_cloud_reid_tpu.data import SyntheticStore

    classes = (list(NUSCENES_CLASSES) if args.dataset == "nuscenes"
               else list(WAYMO_CLASSES))
    store = SyntheticStore(
        num_objects=args.objects, frames_per_obj=args.frames,
        class_names=classes, with_images=args.images,
        crop_size=(args.crop_size, args.crop_size), seed=args.seed)
    store.save(args.root)
    print(json.dumps(dict(root=os.path.abspath(args.root),
                          objects=args.objects, frames=args.frames,
                          dataset=args.dataset, images=args.images)))


if __name__ == "__main__":
    main()
