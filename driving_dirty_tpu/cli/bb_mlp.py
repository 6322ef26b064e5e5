"""Train the coordinate-regression MLP box model.

Reference-compatible entry point for
/root/reference/src/bounding_box_model/bb_coord_reg/bb_MLP.py:

    python -m driving_dirty_tpu.cli.bb_mlp --link <data> --pretrained_path <ae.ckpt>
"""
from driving_dirty_tpu.cli.common import run_task
from driving_dirty_tpu.models.bb_mlp import Boxes


def main(argv=None):
    return run_task(Boxes, argv)


if __name__ == "__main__":
    main()
