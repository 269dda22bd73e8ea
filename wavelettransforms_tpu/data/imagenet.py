"""ImageNet-1k validation data pipeline — TPU-native replacement for the
reference's torch DataLoader stack
(/root/reference/ResNet/testing_suite/setup_test_dataloader.py).

* Flat-directory dataset of ``*.JPEG`` files whose label is the WordNet
  synset ID parsed from the filename (``ILSVRC2012_val_00000001_n01751748``)
  — :13-42 of the reference file.
* Labels: the canonical ImageNet-1k class index equals the rank of the synset
  in lexicographic order, so a directory containing all 1000 classes needs no
  external mapping (the reference imported a gitignored ``imagenet1k.classes``
  module); a mapping file {synset: index} can be supplied for partial dirs.
* Preprocessing parity with torchvision: resize shortest side to 256
  (bilinear), center-crop 224, scale to [0,1], normalize with the ImageNet
  mean/std (:80-86).
* Batching: numpy arrays in NHWC (TPU layout) with a background prefetch
  thread standing in for DataLoader workers.
"""
from __future__ import annotations

import json
import logging
import os
import queue
import threading

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def parse_synset(filename: str) -> str | None:
    root, _ = os.path.splitext(os.path.basename(filename))
    if "_" not in root:
        return None
    _, synset = root.rsplit("_", 1)
    return synset if synset.startswith("n") and synset[1:].isdigit() else None


def preprocess_image(img, size: int = 224, resize: int = 256):
    """PIL image -> normalized float32 HWC array (torchvision-equivalent)."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    if w <= h:
        nw, nh = resize, max(1, round(h * resize / w))
    else:
        nh, nw = resize, max(1, round(w * resize / h))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


class ImageNetFlatDataset:
    """Flat val-image directory with synset-in-filename labels."""

    def __init__(self, root_dir: str, class_index_path: str | None = None,
                 image_size: int = 224, split: str = "validation"):
        self.root_dir = root_dir
        self.image_size = image_size
        self.split = split
        self.image_paths = sorted(
            os.path.join(root_dir, f) for f in os.listdir(root_dir)
            if f.upper().endswith(".JPEG") or f.lower().endswith(".jpg"))
        if class_index_path:
            with open(class_index_path) as f:
                self.wnid_to_class_idx = {
                    k: int(v) for k, v in json.load(f).items()}
        else:
            synsets = sorted({s for s in (
                parse_synset(p) for p in self.image_paths) if s})
            self.wnid_to_class_idx = {s: i for i, s in enumerate(synsets)}

    def __len__(self):
        return len(self.image_paths)

    def label_of(self, path: str) -> int:
        if self.split == "test":
            return -1
        synset = parse_synset(path)
        return self.wnid_to_class_idx.get(synset, -1) if synset else -1

    def __getitem__(self, idx: int):
        from PIL import Image

        path = self.image_paths[idx]
        with Image.open(path) as img:
            arr = preprocess_image(img, self.image_size)
        return arr, self.label_of(path)

    def validate_dataset(self):
        """Count valid/invalid synset filenames
        (setup_test_dataloader.py:44-64)."""
        valid = invalid = 0
        for p in self.image_paths:
            s = parse_synset(p)
            if s is not None and s in self.wnid_to_class_idx:
                valid += 1
            else:
                invalid += 1
                logging.warning("Invalid synset ID in file: %s", p)
        logging.info("Valid samples: %d", valid)
        logging.info("Invalid samples: %d", invalid)
        return valid, invalid

    def sanity_check(self, num_samples: int = 5):
        """Log shapes/labels for the first few samples
        (setup_test_dataloader.py:67-76)."""
        for i in range(min(num_samples, len(self))):
            image, label = self[i]
            logging.info("Sample %d: shape=%s label=%d", i, image.shape, label)


def batch_iterator(dataset, batch_size: int, subset_size: int | None = None,
                   num_workers: int = 4, drop_remainder: bool = False):
    """Yield (images NHWC f32, labels i32) with background prefetch."""
    n = len(dataset)
    if subset_size and subset_size < n:
        n = subset_size
    indices = list(range(n))

    q: queue.Queue = queue.Queue(maxsize=max(2, num_workers))
    SENTINEL = object()

    def producer():
        for start in range(0, n, batch_size):
            batch_idx = indices[start: start + batch_size]
            if drop_remainder and len(batch_idx) < batch_size:
                break
            images = np.empty((len(batch_idx), dataset.image_size,
                               dataset.image_size, 3), np.float32)
            labels = np.empty((len(batch_idx),), np.int32)
            for j, i in enumerate(batch_idx):
                images[j], labels[j] = dataset[i]
            q.put((images, labels))
        q.put(SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is SENTINEL:
            break
        yield item


class SyntheticImageNet:
    """Deterministic synthetic stand-in (offline testing: no network egress,
    no ImageNet in this environment)."""

    def __init__(self, n: int = 64, image_size: int = 224,
                 num_classes: int = 1000, seed: int = 0):
        self.image_size = image_size
        self.n = n
        self.num_classes = num_classes
        self.seed = seed
        self.split = "validation"

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        img = rng.standard_normal(
            (self.image_size, self.image_size, 3)).astype(np.float32)
        return img, int(idx % self.num_classes)
