"""Train a Faster-RCNN box model.

Reference-compatible entry points for
/root/reference/src/bounding_box_model/fast_rcnn/{bb_fast_rcnn,bb_fast_rcnn_w_map}.py:

    python -m driving_dirty_tpu.cli.faster_rcnn --variant rm \
        --link <data> --pretrained_path <ae.ckpt> --gpus 1 --max_epochs 10
"""
import argparse

from driving_dirty_tpu.cli.common import run_task
from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN, FasterRCNNRoadMap

VARIANTS = {"plain": BBFasterRCNN, "rm": FasterRCNNRoadMap}


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--variant", type=str, default="rm", choices=VARIANTS)
    ns, rest = pre.parse_known_args(argv)
    return run_task(VARIANTS[ns.variant], rest)


if __name__ == "__main__":
    main()
