"""Coefficient-artifact CLI — encode/decode checkpoints as .wtc containers.

No reference counterpart (the reference only stores reconstructed weights
via HF save_pretrained, /root/reference/ResNet/utils.py:28-38); this exposes
the encoded-coefficient format (``wavelettransforms_tpu.codec``): a
checkpoint stored AS its (optionally thresholded) DWT coefficients, with
f32/bf16/int8 coefficient dtypes and sparse or dense storage.

    # lossless f32 container
    python -m wavelettransforms_tpu.cli.codec --mode=encode \
        --model_path=/path/to/ckpt --output=ckpt.wtc

    # lossy: 50th-percentile threshold, bf16 coefficients
    python -m wavelettransforms_tpu.cli.codec --mode=encode \
        --model_path=/path/to/ckpt --output=ckpt.wtc \
        --threshold=0.5 --coeff_dtype=bfloat16 --verify

    # decode back to an HF checkpoint directory
    python -m wavelettransforms_tpu.cli.codec --mode=decode \
        --model_path=ckpt.wtc --output=/path/to/decoded
"""
from __future__ import annotations

import json
import os

import numpy as np
from absl import app, flags, logging as absl_logging

from ..wavelets import REFERENCE_WAVELETS

FLAGS = flags.FLAGS

flags.DEFINE_enum("mode", "encode", ["encode", "decode"],
                  "encode a checkpoint into .wtc, or decode one back.")
flags.DEFINE_string("model_path", None,
                    "encode: HF checkpoint dir (or single .safetensors); "
                    "decode: the .wtc artifact.")
flags.DEFINE_string("output", None, "Output path (.wtc file or ckpt dir).")
flags.DEFINE_enum("wavelet", "bior4.4", REFERENCE_WAVELETS,
                  "Wavelet family for the coefficient transform.")
flags.DEFINE_integer("level", 5, "Max decomposition level (clamped/tensor).")
flags.DEFINE_float("threshold", None,
                   "Optional lossy percentile threshold in [0, 1] "
                   "(reference CLI convention: x100 percentile).")
flags.DEFINE_enum("coeff_dtype", "float32", ["float32", "bfloat16", "int8"],
                  "Coefficient storage dtype.")
flags.DEFINE_enum("storage", "auto", ["auto", "dense", "sparse"],
                  "Coefficient storage layout.")
flags.DEFINE_bool("verify", False, "Decode every tensor and report PSNR.")
flags.mark_flag_as_required("model_path")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from .. import codec
    from ..models import load_torch_state, save_torch_state

    if FLAGS.mode == "encode":
        state = load_torch_state(FLAGS.model_path)
        pct = None if FLAGS.threshold is None else FLAGS.threshold * 100.0
        report = codec.encode_checkpoint(
            state, FLAGS.output, FLAGS.wavelet, FLAGS.level,
            percentile=pct, coeff_dtype=FLAGS.coeff_dtype,
            storage=FLAGS.storage, verify=FLAGS.verify)
        absl_logging.info("encoded %s", report.summary())
        if FLAGS.verify:
            worst = min((m.get("psnr_db", float("inf"))
                         for m in report.tensors.values()),
                        default=float("inf"))
            absl_logging.info("worst per-tensor PSNR: %s dB", worst)
        print(json.dumps({
            "raw_mb": round(report.raw_bytes / 1e6, 3),
            "encoded_mb": round(report.encoded_bytes / 1e6, 3),
            "ratio": round(report.ratio, 3),
            "tensors": len(report.tensors),
        }))
    else:
        params = codec.decode_checkpoint(FLAGS.model_path)
        # carry the config.json along when the artifact sits next to one
        src_cfg = os.path.join(os.path.dirname(os.path.abspath(
            FLAGS.model_path)), "config.json")
        config = None
        if os.path.isfile(src_cfg):
            with open(src_cfg) as f:
                config = json.load(f)
        save_torch_state(params, FLAGS.output, config=config)
        n = sum(int(np.asarray(v).size) for v in params.values())
        absl_logging.info("decoded %d tensors (%d params) -> %s",
                          len(params), n, FLAGS.output)
        print(json.dumps({"tensors": len(params), "params": n}))


if __name__ == "__main__":
    app.run(main)
