"""Offline batch pre-tensorization (reference: /root/reference/ResNet/data_prep.py
saves torch .pt batches; here .npz batches in NHWC) and the loader that reads
them back (≡ load_preprocessed_batches,
/root/reference/ResNet/testing_suite/utils.py:135-164)."""
from __future__ import annotations

import os

import numpy as np

from .imagenet import ImageNetFlatDataset, batch_iterator


def prepare_and_save_data(data_dir: str, output_dir: str,
                          batch_size: int = 32, subset_size=None):
    os.makedirs(output_dir, exist_ok=True)
    ds = ImageNetFlatDataset(data_dir)
    count = 0
    for i, (images, labels) in enumerate(
            batch_iterator(ds, batch_size, subset_size)):
        np.savez(os.path.join(output_dir, f"batch_{i}.npz"),
                 images=images, labels=labels)
        count += 1
    return count


def load_preprocessed_batches(batch_dir: str):
    files = sorted(
        (f for f in os.listdir(batch_dir)
         if f.startswith("batch_") and f.endswith(".npz")),
        key=lambda f: int(f.split("_")[1].split(".")[0]))
    for f in files:
        with np.load(os.path.join(batch_dir, f)) as z:
            yield z["images"], z["labels"]
