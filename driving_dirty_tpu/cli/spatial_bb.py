"""Train a spatial occupancy bounding-box model.

Reference-compatible entry points for
/root/reference/src/bounding_box_model/spatial_bb/{spatial_model,spatial_w_rm}.py:

    python -m driving_dirty_tpu.cli.spatial_bb --variant rm --link <data> \
        --pretrained_path <ae.ckpt> [--mse_loss]
"""
import argparse

from driving_dirty_tpu.cli.common import run_task
from driving_dirty_tpu.models.spatial_bb import BBSpatialModel, BBSpatialRoadMap

VARIANTS = {"plain": BBSpatialModel, "rm": BBSpatialRoadMap}


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--variant", type=str, default="rm", choices=VARIANTS)
    ns, rest = pre.parse_known_args(argv)
    return run_task(VARIANTS[ns.variant], rest)


if __name__ == "__main__":
    main()
