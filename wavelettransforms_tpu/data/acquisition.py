"""Dataset acquisition tooling — equivalents of the reference's OneShotTools
(/root/reference/ResNet/OneShotTools/): resumable HTTP downloads of the
ImageNet-1k validation tarball from the HF Hub, tar extraction, and an API
smoke check.

NOTE: this environment has no network egress; these are functional but
network-gated (they raise a clear error when offline).  The rest of the
framework never depends on them — synthetic datasets and random-init
checkpoints cover offline operation.
"""
from __future__ import annotations

import logging
import os
import tarfile

log = logging.getLogger(__name__)

HF_VAL_URL = ("https://huggingface.co/datasets/ILSVRC/imagenet-1k/resolve/"
              "main/data/val_images.tar.gz")


def read_hf_token(path: str = "~/.cache/huggingface/token") -> str | None:
    """Token discovery parity (clone_repo_valset.py:6-12)."""
    p = os.path.expanduser(path)
    if os.path.isfile(p):
        with open(p) as f:
            return f.read().strip()
    return os.environ.get("HF_TOKEN")


def resumable_download(url: str, output_path: str, token: str | None = None,
                       chunk_size: int = 1 << 20) -> str:
    """Range-header resumable download (clone_repo_testset.py:15-40)."""
    import urllib.error
    import urllib.request

    resume_from = os.path.getsize(output_path) if os.path.exists(
        output_path) else 0
    headers = {}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    if resume_from:
        headers["Range"] = f"bytes={resume_from}-"
        log.info("Resuming download at byte %d", resume_from)
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp, \
                open(output_path, "ab" if resume_from else "wb") as out:
            while True:
                chunk = resp.read(chunk_size)
                if not chunk:
                    break
                out.write(chunk)
    except (urllib.error.URLError, OSError) as e:
        raise ConnectionError(
            f"download failed (offline environment?): {e}") from e
    return output_path


def download_val_set(output_dir: str, token: str | None = None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    return resumable_download(HF_VAL_URL,
                              os.path.join(output_dir, "val_images.tar.gz"),
                              token or read_hf_token())


def extract_tar(tar_path: str, output_dir: str) -> str:
    """Tar extraction (tar_extractor.py:5-22)."""
    os.makedirs(output_dir, exist_ok=True)
    with tarfile.open(tar_path, "r:*") as tf:
        tf.extractall(output_dir, filter="data")
    return output_dir


def hf_api_check(token: str | None = None) -> bool:
    """API smoke check (HF_tooling.py:1-11)."""
    import urllib.request

    req = urllib.request.Request(
        "https://huggingface.co/api/whoami-v2",
        headers={"Authorization": f"Bearer {token or read_hf_token() or ''}"})
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status == 200
    except Exception:
        return False
