"""Export a roadmap checkpoint to a self-contained .ddx serving artifact.

TPU-native deployment surface (no reference equivalent — the reference's
only inference story is re-importing the model code and the Lightning ckpt,
README.md:33-37). The artifact carries the AOT-lowered StableHLO program +
weights + metadata; a serving host needs only `cli.serve` / `export.load`.

    python -m driving_dirty_tpu.cli.export --rm_ckpt_path <ckpt> \
        --out model.ddx [--batch_size 8] [--precision 8 --calib_link <data>]
    python -m driving_dirty_tpu.cli.export --kind detection \
        --rm_ckpt_path fr.ckpt --out det.ddx
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rm_ckpt_path", required=True,
                    help="framework .ckpt or raw Lightning rm.ckpt")
    ap.add_argument("--kind", default="roadmap",
                    choices=["roadmap", "detection", "spatial", "multitask"],
                    help="roadmap: views -> 800x800 mask; detection: a "
                         "faster_rcnn[_rm] ckpt -> fixed-shape detections; "
                         "spatial: a spatial_bb/spatial_rm ckpt -> occupancy "
                         "probabilities; multitask: -> road mask + box "
                         "occupancy from one shared encoder pass")
    ap.add_argument("--out", required=True, help=".ddx artifact path")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--precision", type=int, default=None, choices=[8, 16, 32])
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma list of lowering targets (default tpu,cpu)")
    ap.add_argument("--calib_link", default=None,
                    help="dataset root for int8 calibration (--precision 8)")
    args = ap.parse_args(argv)

    from driving_dirty_tpu.cli.common import honor_platform_env

    honor_platform_env()

    calib = None
    if args.precision == 8:
        if args.calib_link is None:
            ap.error("--precision 8 needs --calib_link for scale calibration")
        from driving_dirty_tpu.data.dataset import LABELED_SCENES, LabeledDataset
        from driving_dirty_tpu.data.pipeline import Loader

        ds = LabeledDataset(
            args.calib_link, f"{args.calib_link}/annotation.csv",
            LABELED_SCENES[:1], samples_per_scene=args.batch_size,
            raw_uint8=True,
        )
        first, _ = next(iter(Loader(ds, args.batch_size, shuffle=False,
                                    num_workers=1)))
        # keep the road channel too: the faster_rcnn_rm trunk input fuses it,
        # so its int8 calibration needs the same (images, road) pair
        calib = {"images": first["images"], "road": first.get("road")}

    from driving_dirty_tpu import export as ddx

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if args.kind == "detection":
        meta = ddx.export_detection(
            args.rm_ckpt_path, args.out, batch_size=args.batch_size,
            precision=args.precision, platforms=platforms, calib=calib,
        )
    elif args.kind == "spatial":
        meta = ddx.export_spatial(
            args.rm_ckpt_path, args.out, batch_size=args.batch_size,
            precision=args.precision, platforms=platforms,
            calib_images=None if calib is None else calib["images"],
        )
    elif args.kind == "multitask":
        meta = ddx.export_multitask(
            args.rm_ckpt_path, args.out, batch_size=args.batch_size,
            precision=args.precision, platforms=platforms,
            calib_images=None if calib is None else calib["images"],
        )
    else:
        meta = ddx.export_roadmap(
            args.rm_ckpt_path, args.out, batch_size=args.batch_size,
            precision=args.precision, platforms=platforms,
            calib_images=None if calib is None else calib["images"],
        )
    import os

    print(f"exported {args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB "
          f"batch={meta['batch_size']} precision={meta['precision']} "
          f"platforms={','.join(meta['platforms'])}")


if __name__ == "__main__":
    main()
