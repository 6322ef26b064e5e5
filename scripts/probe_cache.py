"""Measure the decode-once sample cache (data/cache.py): items/s for
epoch-1 (JPEG/PNG decode) vs epoch-2+ (memmap reads), labeled and unlabeled.

Run: python scripts/probe_cache.py [--samples 64] [--workers 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def rate(ds, idxs, workers):
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(workers) as pool:
        for _ in pool.map(ds.__getitem__, idxs):
            pass
    return len(idxs) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4 * (os.cpu_count() or 1))
    a = ap.parse_args()

    from driving_dirty_tpu.data.cache import SampleCache
    from driving_dirty_tpu.data.dataset import LabeledDataset, UnlabeledDataset
    from driving_dirty_tpu.data.synthetic import generate

    with tempfile.TemporaryDirectory() as root, tempfile.TemporaryDirectory() as cdir:
        generate(root, scenes=1, samples=a.samples, labeled_scenes=1, seed=0)
        for name, ds in [
            ("unlabeled", UnlabeledDataset(root, [0], "sample",
                                           samples_per_scene=a.samples, raw_uint8=True)),
            ("labeled", LabeledDataset(root, f"{root}/annotation.csv", [106],
                                       samples_per_scene=a.samples, raw_uint8=True)),
        ]:
            idxs = list(range(len(ds)))
            cold = rate(ds, idxs, a.workers)
            cached = SampleCache(ds, cdir)
            cached.warm(a.workers)
            warm = rate(cached, idxs, a.workers)
            bytes_row = sum(
                int(np.prod(cached._meta["shape"][k])) * np.dtype(cached._meta["store_dtype"][k]).itemsize
                for k in cached._meta["keys"]
            )
            print(f"{name}: decode {cold:.1f} items/s -> cached {warm:.1f} items/s "
                  f"({warm/cold:.1f}x), {bytes_row/1e6:.2f} MB/item on disk "
                  f"[{a.workers} threads, {os.cpu_count()} cpus]")


if __name__ == "__main__":
    main()
