"""Train the self-supervised autoencoder.

Reference-compatible entry point
(`python src/autoencoder/autoencoder.py --link ... --gpus 1 --max_epochs 5
--batch_size 32`, /root/reference/README.md:43):

    python -m driving_dirty_tpu.cli.basic_ae --link <data> --gpus 1 \
        --max_epochs 5 --batch_size 32
"""
from driving_dirty_tpu.cli.common import run_task
from driving_dirty_tpu.models.basic_ae import BasicAE


def main(argv=None):
    return run_task(BasicAE, argv)


if __name__ == "__main__":
    main()
