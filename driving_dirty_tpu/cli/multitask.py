"""Train the joint roadmap + box-occupancy multi-task model (BASELINE config 5).

    python -m driving_dirty_tpu.cli.multitask --link <data> \
        --pretrained_path <ae.ckpt> --gpus 8 --model_parallel 2
"""
from driving_dirty_tpu.cli.common import run_task
from driving_dirty_tpu.models.multitask import MultiTask


def main(argv=None):
    return run_task(MultiTask, argv)


if __name__ == "__main__":
    main()
