"""End-to-end CLI + eval-suite tests on tiny synthetic models/data."""
import csv
import os

import numpy as np
import pytest

from wavelettransforms_tpu.data.imagenet import (SyntheticImageNet,
                                                 batch_iterator, parse_synset)
from wavelettransforms_tpu.eval.harness import (evaluate_all,
                                                read_metrics_file)
from wavelettransforms_tpu.models import create_random_checkpoint
from wavelettransforms_tpu.models.resnet import ResNetConfig
from wavelettransforms_tpu.utils.logging import (LogWorker, read_layer_log,
                                                 write_layer_log)

TINY = ResNetConfig(hidden_sizes=(8, 16, 32, 64), embedding_size=8,
                    depths=(1, 1, 1, 1), num_labels=10)


def test_parse_synset():
    assert parse_synset("ILSVRC2012_val_00000001_n01751748.JPEG") == "n01751748"
    assert parse_synset("weird.JPEG") is None
    assert parse_synset("a_b_nXY.JPEG") is None


def test_synthetic_batches():
    ds = SyntheticImageNet(10, image_size=32, num_classes=4)
    batches = list(batch_iterator(ds, 4))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    assert batches[0][0].shape == (4, 32, 32, 3)
    # deterministic
    b2 = list(batch_iterator(ds, 4))
    np.testing.assert_array_equal(batches[0][0], b2[0][0])


def test_prune_cli_end_to_end(tmp_path):
    """The reference's full main_pruning flow: 3 pruned checkpoints, layer
    logs, experiment log — then evaluate all three."""
    from wavelettransforms_tpu.cli.prune import run_pruning_experiment

    og = create_random_checkpoint(str(tmp_path / "OGModel"), TINY, seed=0)
    csv_path = str(tmp_path / "experiment_log.csv")
    out_dir = str(tmp_path / "SavedModels")
    results, guid = run_pruning_experiment(
        og, "bior2.2", 2, 0.5, csv_path, out_dir)

    assert set(results) == {"selective", "random", "min"}
    run_dir = os.path.join(out_dir,
                           f"bior2.2_threshold-0.5_level-2_guid-{guid[:4]}")
    for phase in ("selective", "random", "min"):
        d = os.path.join(run_dir, f"{phase}_pruned")
        assert os.path.isfile(os.path.join(d, "model.safetensors"))
        assert os.path.isfile(os.path.join(d, "config.json"))
        assert os.path.isfile(os.path.join(d, "log.csv"))

    # experiment log: 3 rows, reference schema
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert set(rows[0]) == {"GUID", "Wavelet", "Level", "Threshold", "Phase",
                            "Total Pruned Count", "Total Non-Zero Params",
                            "Model Path"}

    # budget coupling via the log file (reference contract)
    originals, pruned, frac = read_layer_log(
        os.path.join(run_dir, "selective_pruned", "log.csv"))
    assert frac == pytest.approx(results["selective"].prune_fraction)
    _, rnd_pruned, _ = read_layer_log(
        os.path.join(run_dir, "random_pruned", "log.csv"))
    assert rnd_pruned == pruned  # random replays exact per-layer counts

    # evaluate all three pruned models on synthetic data
    ds = SyntheticImageNet(16, image_size=64, num_classes=10)
    evals = evaluate_all(run_dir, lambda: batch_iterator(ds, 8),
                         num_threads=2)
    assert len(evals) == 3
    for r in evals:
        m = read_metrics_file(os.path.join(run_dir, r.model_name,
                                           "evaluation_metrics.txt"))
        assert "Accuracy" in m and "Sparsity" in m
        assert 0.0 <= r.sparsity <= 1.0
        # model size + inference time extras (README.md:131-134, absent in
        # the reference suite)
        assert float(m["Model Size (MB)"]) > 0
        assert float(m["Inference Images/s"]) > 0
        assert r.mean_batch_ms > 0 and r.model_size_nnz_mb > 0


def test_sweep_cli_resume_and_aggregates(tmp_path):
    """Sweep driver: resumable grid + the reference's aggregate deliverables
    (PreliminaryResults CSV schema, accuracy-vs-threshold figure)."""
    import json

    from wavelettransforms_tpu.cli import sweep as sweep_cli

    og = create_random_checkpoint(str(tmp_path / "OGModel"), TINY, seed=0)
    out_dir = str(tmp_path / "SavedModels")
    argv = ["prog", f"--model_path={og}", "--wavelet=haar", "--level=2",
            "--thresholds=0.0,0.5", "--synthetic_eval=8",
            f"--csv_path={tmp_path / 'experiment_log.csv'}",
            f"--output_dir={out_dir}"]
    sweep_cli.FLAGS(argv)
    sweep_cli.main([])

    progress_path = os.path.join(out_dir, "sweep_progress.json")
    with open(progress_path) as f:
        done1 = json.load(f)
    assert len(done1) == 2

    prelim = os.path.join(out_dir, "PreliminaryResults",
                          "Haar_Wavelet_Pruning_Metrics_Data_level_2.csv")
    with open(prelim) as f:
        rows = list(csv.DictReader(f))
    # 2 thresholds x 3 methods, reference schema + ordering (desc threshold)
    # plus the trailing truth-label column (synthetic-eval marker)
    assert len(rows) == 6
    assert list(rows[0]) == ["Threshold", "Model", "Accuracy", "F1 Score",
                             "Recall", "Average Loss", "Sparsity",
                             "Synthetic"]
    assert all(r["Synthetic"] == "true" for r in rows)  # synthetic_eval run
    assert [r["Threshold"] for r in rows] == ["0.5"] * 3 + ["0.0"] * 3
    assert [r["Model"] for r in rows[:3]] == [
        "min_pruned", "random_pruned", "selective_pruned"]

    plots = [p for p in os.listdir(out_dir) if p.endswith(".png")]
    assert any("Accuracy vs. Threshold" in p for p in plots)

    # resume: a second invocation skips every threshold (same guids kept)
    sweep_cli.main([])
    with open(progress_path) as f:
        assert json.load(f) == done1


def test_preliminary_results_real_data_schema(tmp_path):
    """Real-data rows (no Synthetic key) keep the reference's exact
    7-column schema — the truth-label column appears only for synthetic
    evals (PreliminaryResults/..._level_5.csv header parity)."""
    from wavelettransforms_tpu.cli.sweep import write_preliminary_results

    path = str(tmp_path / "PreliminaryResults" / "out.csv")
    write_preliminary_results(path, [
        {"Threshold": 0.5, "Model": "selective_pruned", "Accuracy": 0.1,
         "F1 Score": 0.1, "Recall": 0.1, "Average Loss": 2.0,
         "Sparsity": 0.5},
    ])
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0]) == ["Threshold", "Model", "Accuracy", "F1 Score",
                             "Recall", "Average Loss", "Sparsity"]


def test_log_worker(tmp_path):
    path = str(tmp_path / "log.csv")
    w = LogWorker(path)
    for i in range(5):
        w.put(f"guid{i}", "haar", 1, 0.5, "selective", i, 100 - i, "p")
    w.close()
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    assert {r["GUID"] for r in rows} == {f"guid{i}" for i in range(5)}


def test_layer_log_roundtrip(tmp_path):
    from wavelettransforms_tpu.prune.api import LayerPruneStats, PruneStats

    stats = PruneStats(phase="selective", wavelet="haar", level=1,
                       threshold=0.5)
    stats.layers.append(LayerPruneStats("conv1", 100, 60, 40))
    stats.layers.append(LayerPruneStats("conv2", 200, 150, 50))
    p = write_layer_log(str(tmp_path / "log.csv"), stats, "abcd1234")
    originals, pruned, frac = read_layer_log(p)
    assert originals == {"conv1": 100, "conv2": 200}
    assert pruned == {"conv1": 40, "conv2": 50}
    assert frac == pytest.approx(90 / 300)


def test_bench_measure_clean_attempt_priority(monkeypatch):
    """bench.measure(): keeps the minimum median among CLEAN attempts when
    any exist (a contaminated attempt's median can spuriously UNDERSHOOT),
    else the minimum overall; records per-row spread + attempts in detail."""
    import bench as bench_mod

    seq = [(0.5e-3, 1.2), (0.9e-3, 0.05)]

    def fake_chain_bench(fn, x, n1=10, n2=110, spread_out=None, warmup=2,
                         repeats=5):
        t, sp = seq.pop(0)
        spread_out.append(sp)
        return t

    import wavelettransforms_tpu.utils.profiling as prof
    monkeypatch.setattr(prof, "chain_bench", fake_chain_bench)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    detail = {}
    t = bench_mod.measure(None, None, row="r_ms", detail=detail)
    # attempt 1 (0.5 ms) was contaminated (120% spread): the clean 0.9 ms
    # attempt wins despite the faster noisy median, and measuring stops at
    # the first clean attempt
    assert abs(t - 0.9e-3) < 1e-9
    assert detail["r_ms"] == 0.9
    assert detail["r_ms_spread_pct"] == 5.0
    assert detail["r_ms_attempts_ms"] == [0.5, 0.9]

    # all-noisy: minimum overall, self-labeled by its spread
    seq[:] = [(2.0e-3, 0.9), (1.5e-3, 0.8), (1.8e-3, 0.7), (1.7e-3, 0.75),
              (1.9e-3, 0.6), (1.6e-3, 0.65)]
    detail = {}
    t = bench_mod.measure(None, None, row="n_ms", detail=detail)
    assert abs(t - 1.5e-3) < 1e-9
    assert detail["n_ms_spread_pct"] == 80.0
    assert len(detail["n_ms_attempts_ms"]) == bench_mod.MAX_ATTEMPTS


def test_pallas_routing_rule(monkeypatch):
    """_pallas_eligible: the measured r5 crossover rule — aligned
    periodization tensors route iff both dims divide 128 << level (every
    compiling config wins); ragged keeps the 2^20 floor."""
    from wavelettransforms_tpu.prune import dwt_prune as dp

    monkeypatch.setattr(dp.jax, "default_backend", lambda: "tpu",
                        raising=False)
    import jax as jax_mod
    monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
    ok = dp._pallas_eligible
    assert ok((512, 512), "periodization", (-2, -1), 2)
    assert ok((1024, 512), "periodization", (-2, -1), 2)
    assert ok((4096, 4096), "periodization", (-2, -1), 4)
    # sub-128 subbands do not compile -> XLA
    assert not ok((256, 256), "periodization", (-2, -1), 2)
    assert not ok((512, 512), "periodization", (-2, -1), 3)
    assert not ok((1024, 512), "periodization", (-2, -1), 3)
    # unaligned dims: ragged path keeps the 2^20 floor
    assert ok((4095, 4095), "periodization", (-2, -1), 4)
    assert not ok((1023, 511), "periodization", (-2, -1), 2)
    # valid-size modes keep the floor
    assert ok((4096, 4096), "symmetric", (-2, -1), 4)
    assert not ok((512, 512), "symmetric", (-2, -1), 2)
