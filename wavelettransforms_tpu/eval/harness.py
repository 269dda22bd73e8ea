"""Model evaluation harness — TPU-native equivalent of the reference's
testing suite (/root/reference/ResNet/testing_suite/main.py).

* jitted batched inference on the flax model (TPU forward pass);
* accuracy / weighted-F1 / recall / avg CE loss / near-zero sparsity per
  model (eval_model.py parity);
* concurrent evaluation of many stored models with per-model isolation and
  timeout (ThreadPoolExecutor, :126-144);
* per-model ``evaluation_metrics.txt`` (:82-90) and metric bar-chart PDF
  (:28-49).
"""
from __future__ import annotations

import functools
import logging
import os
import time
import traceback
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (ResNetConfig, create_model, load_config,
                      load_torch_state, torch_state_to_flax)
from .metrics import (classification_metrics, model_size_bytes,
                      model_sparsity)

log = logging.getLogger(__name__)


@dataclass
class EvalResult:
    model_name: str
    accuracy: float
    f1: float
    recall: float
    avg_loss: float
    sparsity: float
    num_samples: int
    seconds: float
    # extras the reference discusses but never implemented
    # (/root/reference/README.md:131-134): first-class here.
    images_per_s: float = 0.0
    mean_batch_ms: float = 0.0
    model_size_mb: float = 0.0
    model_size_nnz_mb: float = 0.0
    # True when the eval data is a synthetic stand-in (random images — NOT
    # ImageNet); such accuracy columns must never be diffed against
    # BASELINE.md's pretrained-weights numbers.
    synthetic_eval: bool = False


def evaluate_model(model, variables, batches):
    """Run inference over an iterable of (images NHWC, labels) batches.
    Returns (all_labels, all_preds, avg_loss, n, timing) where timing has
    ``mean_batch_ms`` (steady-state forward latency, first/compile batch
    excluded) and ``images_per_s``.  Timing brackets the host read of the
    logits, which forces device completion (block_until_ready is unreliable
    on tunneled platforms)."""
    all_preds: list = []
    all_labels: list = []
    total_loss = 0.0
    num_batches = 0
    batch_times: list = []
    batch_sizes: list = []
    n_classes = None

    @jax.jit
    def forward(variables, images, labels):
        # loss stays on-device with the forward pass — mean CE per batch,
        # averaged over batches (reference semantics, eval_model.py:50-52
        # + :81); only preds and the loss scalar cross to the host.
        logits = model.apply(variables, images)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.argmax(logits, axis=-1), -jnp.mean(ll)

    for i, (images, labels) in enumerate(batches):
        images = jnp.asarray(images)
        labels = np.asarray(labels)
        if n_classes is None:
            n_classes = int(jax.eval_shape(
                lambda v, im: model.apply(v, im), variables,
                images).shape[-1])
        if labels.size and labels.max() >= n_classes:
            raise ValueError(
                f"label {labels.max()} out of range for model with "
                f"{n_classes} classes — check the dataset's class "
                "space (e.g. --synthetic_classes)")
        tb = time.perf_counter()
        preds, loss = forward(variables, images, jnp.asarray(labels))
        preds = np.asarray(preds)  # host read forces device completion
        batch_times.append(time.perf_counter() - tb)
        batch_sizes.append(len(labels))
        total_loss += float(loss)
        num_batches += 1
        all_preds.extend(preds.tolist())
        all_labels.extend(labels.tolist())
        if i % 10 == 0:
            log.info("Processed batch %d (total preds %d)", i, len(all_preds))
    avg_loss = total_loss / num_batches if num_batches else float("inf")
    # steady-state window = batches 1..N (batch 0 pays the compile); both
    # mean latency and images/s are computed over the SAME window.
    if len(batch_times) > 1:
        steady_t, steady_n = batch_times[1:], batch_sizes[1:]
    else:
        steady_t, steady_n = batch_times, batch_sizes
    mean_batch = float(np.mean(steady_t)) if steady_t else 0.0
    ips = (float(np.sum(steady_n)) / float(np.sum(steady_t))
           if steady_t and np.sum(steady_t) > 0 else 0.0)
    n = len(all_preds)
    timing = {"mean_batch_ms": mean_batch * 1e3, "images_per_s": ips}
    return all_labels, all_preds, avg_loss, n, timing


def evaluate_checkpoint_dir(model_dir: str, batches_factory,
                            write_artifacts: bool = True,
                            synthetic: bool = False) -> EvalResult:
    """Load an HF checkpoint dir, evaluate it, write metrics + plot.
    ``synthetic`` marks the result (and metrics.txt) as a synthetic-data
    run whose quality numbers are NOT ImageNet-comparable."""
    t0 = time.time()
    model_name = os.path.basename(os.path.normpath(model_dir))
    state = load_torch_state(model_dir)
    cfg = ResNetConfig.from_hf_dict(load_config(model_dir))
    model = create_model(cfg)
    variables = torch_state_to_flax(state)
    labels, preds, avg_loss, n, timing = evaluate_model(
        model, variables, batches_factory())
    accuracy, f1, recall = classification_metrics(labels, preds)
    sparsity = model_sparsity(state)
    result = EvalResult(
        model_name, accuracy, f1, recall, avg_loss, sparsity, n,
        time.time() - t0,
        images_per_s=timing["images_per_s"],
        mean_batch_ms=timing["mean_batch_ms"],
        model_size_mb=model_size_bytes(state, dense=True) / 1e6,
        model_size_nnz_mb=model_size_bytes(state, dense=False) / 1e6,
        synthetic_eval=synthetic)
    if write_artifacts:
        write_metrics_file(model_dir, result)
        try:
            create_and_save_plot(model_dir, result)
        except Exception:  # matplotlib issues must not fail the eval
            log.warning("plot failed:\n%s", traceback.format_exc())
    return result


def write_metrics_file(model_dir: str, r: EvalResult) -> str:
    """evaluation_metrics.txt with the reference's exact format
    (testing_suite/main.py:82-90)."""
    path = os.path.join(model_dir, "evaluation_metrics.txt")
    with open(path, "w") as f:
        f.write(f"Model: {r.model_name}\n")
        f.write(f"Accuracy: {r.accuracy}\n")
        f.write(f"F1 Score: {r.f1}\n")
        f.write(f"Recall: {r.recall}\n")
        f.write(f"Average Loss: {r.avg_loss}\n")
        f.write(f"Sparsity: {r.sparsity}\n")
        f.write(f"Sparsity: {r.sparsity * 100:.4f}%\n")
        # extras beyond the reference format (appended so the reference's
        # lines still diff cleanly against its artifacts)
        f.write(f"Inference Images/s: {r.images_per_s:.2f}\n")
        f.write(f"Mean Batch Latency (ms): {r.mean_batch_ms:.3f}\n")
        f.write(f"Model Size (MB): {r.model_size_mb:.3f}\n")
        f.write(f"Model Size NNZ-compressed (MB): {r.model_size_nnz_mb:.3f}\n")
        if r.synthetic_eval:
            f.write("Synthetic Eval: true (random-data stand-in — quality "
                    "numbers are NOT ImageNet-comparable)\n")
    return path


def read_metrics_file(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                out.setdefault(k.strip(), v.strip())
    return out


def create_and_save_plot(model_dir: str, r: EvalResult) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 6))
    metrics = ["Accuracy", "F1 Score", "Recall", "Sparsity"]
    values = [r.accuracy, r.f1, r.recall, r.sparsity]
    plt.bar(metrics, values)
    plt.title(f"Model Evaluation Metrics: {r.model_name}")
    plt.ylabel("Score")
    plt.ylim(0, 1)
    for i, v in enumerate(values):
        plt.text(i, v, f"{v:.3f}", ha="center", va="bottom")
    plt.text(0.5, -0.15, f"Average Loss: {r.avg_loss:.4f}", ha="center",
             transform=plt.gca().transAxes)
    plt.text(0.5, -0.25, f"Sparsity: {r.sparsity * 100:.4f}%", ha="center",
             transform=plt.gca().transAxes)
    path = os.path.join(model_dir,
                        f"{r.model_name}_evaluation_metrics_plot.pdf")
    plt.savefig(path)
    plt.close()
    return path


def evaluate_all(parent_dir: str, batches_factory, num_threads: int = 4,
                 timeout: float = 600.0,
                 synthetic: bool = False) -> list[EvalResult]:
    """Evaluate every model subdirectory concurrently with per-model
    isolation and timeout (testing_suite/main.py:121-144)."""
    model_dirs = [os.path.join(parent_dir, d)
                  for d in sorted(os.listdir(parent_dir))
                  if os.path.isdir(os.path.join(parent_dir, d))]
    results = []
    with ThreadPoolExecutor(max_workers=num_threads) as ex:
        futures = {ex.submit(evaluate_checkpoint_dir, d, batches_factory,
                             synthetic=synthetic): d
                   for d in model_dirs}
        for fut in as_completed(futures):
            d = futures[fut]
            try:
                results.append(fut.result(timeout=timeout))
            except Exception as e:
                log.error("Evaluation failed for %s: %s", d, e)
    for r in results:
        log.info("Model %s: acc=%.5f f1=%.5f recall=%.5f loss=%.4f "
                 "sparsity=%.5f (%.1fs)", r.model_name, r.accuracy, r.f1,
                 r.recall, r.avg_loss, r.sparsity, r.seconds)
    return results
