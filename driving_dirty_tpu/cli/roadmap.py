"""Train a roadmap model.

Reference-compatible entry points for
/root/reference/src/roadmap_model/{roadmap_pretrain_ae,roadmap_bce_loss,
roadmap_bce_v2}.py:

    python -m driving_dirty_tpu.cli.roadmap --variant bce_v2 \
        --link <data> --pretrained_path <ae.ckpt> --gpus 1 --max_epochs 20
"""
import argparse

from driving_dirty_tpu.cli.common import run_task
from driving_dirty_tpu.models.roadmap import RoadMap, RoadMapBCE, RoadMapBCEv2

VARIANTS = {"mse": RoadMap, "bce_v1": RoadMapBCE, "bce_v2": RoadMapBCEv2}


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--variant", type=str, default="bce_v2", choices=VARIANTS)
    ns, rest = pre.parse_known_args(argv)
    return run_task(VARIANTS[ns.variant], rest)


if __name__ == "__main__":
    main()
