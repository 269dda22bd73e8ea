"""Benchmark entry point (driver artifact).

Measures the north-star metrics (BASELINE.json): DWT+IDWT filter-bank
throughput per chip and the full ResNet-18 checkpoint encode time, on
whatever backend is available (the real TPU chip under the driver).

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Detail lines go to stderr.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the ratio is measured against this framework's own XLA-conv path on the same
chip — i.e. the speedup the hand-written Pallas kernels deliver over the
compiler baseline for the same operation.

Process model: ONE SUBPROCESS PER SECTION.  On this host a long chained
launch sequence can wedge the TPU client (every subsequent launch in the
same process throws INVALID_ARGUMENT, measured after the L4 full-prune
chain); a fresh client recovers cleanly, and the persistent compile cache
(.jax_cache) makes respawns cheap.  The parent assembles the JSON line from
whichever sections succeeded, so one bad section can never kill the bench.

Survivability (round-2 lesson: two cold-compile section timeouts pushed the
parent past the driver's own budget and the JSON was never printed):
  * GLOBAL DEADLINE — total budget from $BENCH_BUDGET_S (default 1500 s);
    each section gets the REMAINING budget (capped per-section), and
    sections that no longer fit are skipped, not attempted.
  * INCREMENTAL RESULTS — the cumulative JSON line is printed after EVERY
    section (last line wins) and persisted to bench_partial.json, so a
    driver kill at any moment still leaves a parseable artifact.
  * Section order is headline-first: core -> gang -> prune -> prune_sym
    -> modes -> eval.

Measurement credibility (round-5 hardening): every row runs through
``measure()`` — repeated spread-bounded chain_bench attempts with
escalating settles, clean-attempt-priority minimum, and per-row spread (+
per-attempt medians when a re-measure happened) emitted into ``detail`` so
a contaminated row is self-labeling in the artifact.

Timing method: chained data-dependent dispatch + host read with two-length
slope (this host's tunnel makes block_until_ready unreliable; see
utils/profiling.chain_bench).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SECTIONS = ("core", "gang", "prune", "prune_sym", "modes", "eval")
# Floor below which a section is skipped rather than started (a cold Mosaic
# compile alone can take minutes; starting a section with <90s left only
# burns budget that later sections could have used... except later sections
# are cheaper, so the floor stays small to let warm-cache runs through).
MIN_SECTION_S = 90.0
# Per-section cap: the remote Mosaic compile service re-loads kernels per
# process with a heavy tail (observed 5 s .. >560 s for the same warm
# program); 700 s covers the tail while the headline-first order keeps the
# budget spent on the most important sections.
MAX_SECTION_S = 700.0


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# Spread above which a measurement attempt is considered contaminated
# (host/chip contention during the driver window); r04 recorded 126% on the
# headline and 5-10x-slow `modes` rows that a single re-measure kept.
TARGET_SPREAD = 0.20
# attempts break at the first clean one, so a calm window costs one; six
# covers the observed noisy-window runs where attempt 3-4 first went clean
MAX_ATTEMPTS = 6


def measure(fn, x, spread_out: list | None = None, row: str | None = None,
            detail: dict | None = None):
    """chain_bench repeated (up to MAX_ATTEMPTS, escalating settles) until
    the slope spread across repeats is < TARGET_SPREAD.

    Kept value: the MINIMUM median among CLEAN attempts (spread <= target)
    when any exist, else the minimum median overall.  A contaminated
    attempt's median can be spuriously FAST as well as slow (contention
    during the short chain inflates its intercept and the slope can
    undershoot), so a raw min-of-medians over noisy attempts is not
    trustworthy — clean attempts take priority.

    When ``row``/``detail`` are given the row value (ms), its spread (%)
    and — if more than one attempt ran — every attempt's median are
    recorded in ``detail`` so a contaminated row is self-labeling in the
    driver artifact (BENCH_r*.json)."""
    from wavelettransforms_tpu.utils.profiling import chain_bench

    attempts: list[tuple[float, float]] = []  # (median_s, spread)
    for k in range(MAX_ATTEMPTS):
        sp: list = []
        # Retries escalate warmup, slope repeats AND chain length: freshly
        # program-switched measurements start contaminated on this host,
        # and sub-ms ops are feed-gap-dominated at the default 100-step
        # chains (measured: a 0.54 ms-device-time roundtrip read 1.3 ms at
        # 104% spread with 100-step chains, 0.55 ms at 4% with 800-step).
        # Long chains also kick in immediately for fast ops.
        if k == 0:
            wu, reps, n1, n2 = 2, 5, 10, 110
        else:
            wu, reps = 3, 7
            if attempts[-1][0] < 1.5e-3:
                # sub-ms op: long chains (slow ops keep short chains — a
                # multi-second launch chain can wedge the client)
                n1, n2 = (20, 420) if k == 1 else (50, 850)
            else:
                n1, n2 = 10, 110
        t = retry(lambda: chain_bench(fn, x, n1=n1, n2=n2, spread_out=sp,
                                      warmup=wu, repeats=reps))
        attempts.append((t, sp[-1]))
        if sp[-1] <= TARGET_SPREAD:
            break
        if k < MAX_ATTEMPTS - 1:
            settle = 5.0 * (k + 1)
            log(f"noisy measurement (spread {sp[-1]*100:.0f}%), settling "
                f"{settle:.0f}s and re-measuring")
            time.sleep(settle)
    clean = [a for a in attempts if a[1] <= TARGET_SPREAD]
    t, spread = min(clean or attempts, key=lambda a: a[0])
    if spread_out is not None:
        spread_out.append(spread)
    if detail is not None and row:
        detail[row] = round(t * 1e3, 3)
        detail[row + "_spread_pct"] = round(spread * 100, 1)
        if len(attempts) > 1:
            detail[row + "_attempts_ms"] = [round(a[0] * 1e3, 3)
                                            for a in attempts]
    return t


def retry(fn, attempts: int = 3, settle_s: float = 5.0):
    """Transient INVALID_ARGUMENT can happen when a new program
    remote-compiles while earlier chained launches drain; settle + retry.
    (A WEDGED client — every launch failing — is handled by the
    section-per-subprocess structure, not here.)"""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError
            if i == attempts - 1 or "INVALID_ARGUMENT" not in str(e):
                raise
            log(f"transient TPU error (attempt {i + 1}), retrying: {e}")
            time.sleep(settle_s * (i + 1))


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    return jax


def _resnet18_conv_stack():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    shapes = ([(64, 3, 7, 7)] + [(64, 64, 3, 3)] * 4
              + [(128, 64, 3, 3), (128, 128, 3, 3), (128, 64, 1, 1)]
              + [(128, 128, 3, 3)] * 2
              + [(256, 128, 3, 3), (256, 256, 3, 3), (256, 128, 1, 1)]
              + [(256, 256, 3, 3)] * 2
              + [(512, 256, 3, 3), (512, 512, 3, 3), (512, 256, 1, 1)]
              + [(512, 512, 3, 3)] * 2)
    tensors = tuple(jnp.asarray(rng.standard_normal(s).astype(np.float32))
                    for s in shapes)
    return shapes, tensors


N = 4096
WAVELET = "bior4.4"


def _big_input():
    import jax.numpy as jnp

    return jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, N, N)).astype(np.float32))


def run_section(section: str) -> dict:
    """Run one bench section in THIS process; return its detail dict."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.utils.profiling import chain_bench

    on_tpu = jax.default_backend() == "tpu"
    detail: dict = {"backend": jax.default_backend()}

    if section == "core":
        x = _big_input()
        nbytes = x.size * 4
        if on_tpu:
            from wavelettransforms_tpu.ops.pallas import filterbank as fb

            # ONE jitted program containing both kernels (coefficients still
            # round-trip through HBM between the two pallas calls): one
            # dispatch per step instead of two (~35us less launch overhead).
            roundtrip = jax.jit(lambda v: fb.idwt2_level_pallas(
                *fb.dwt2_level_pallas(v, WAVELET), WAVELET))
        else:
            roundtrip = jax.jit(lambda v: dj.waverec2_packed(
                dj.wavedec2_packed(v[0], WAVELET, 1), WAVELET, 1, N, N)[None])
        spreads = []
        t0 = time.time()
        t_pallas = measure(roundtrip, x, spread_out=spreads,
                           row="roundtrip_ms_4096x4096_bior44", detail=detail)
        gbs = 2 * 2 * nbytes / t_pallas / 1e9
        log(f"fused roundtrip {WAVELET} L1 {N}^2: {t_pallas*1e3:.3f} ms "
            f"-> {gbs:.1f} GB/s (spread {spreads[-1]*100:.1f}%, "
            f"setup {time.time()-t0:.0f}s)")
        detail["roundtrip_gbs"] = round(gbs, 1)
        detail["roundtrip_spread_pct"] = round(spreads[-1] * 100, 1)

        xla_roundtrip = jax.jit(lambda v: dj.waverec2_packed(
            dj.wavedec2_packed(v[0], WAVELET, 1), WAVELET, 1, N, N)[None])
        t0 = time.time()
        t_xla = measure(xla_roundtrip, x,
                        row="xla_conv_roundtrip_ms", detail=detail)
        log(f"XLA-conv roundtrip: {t_xla*1e3:.3f} ms -> "
            f"{2*2*nbytes/t_xla/1e9:.1f} GB/s (setup {time.time()-t0:.0f}s)")
        return detail

    if section == "gang":
        from wavelettransforms_tpu.prune.dwt_prune import _gang_encode
        from wavelettransforms_tpu.prune.min_weight import _gang_min
        from wavelettransforms_tpu.prune.random_prune import _gang_random

        shapes, tensors = _resnet18_conv_stack()
        n_params = sum(int(np.prod(s)) for s in shapes)
        detail["resnet18_prunable_params"] = n_params
        log(f"ResNet-18 stack: {len(shapes)} conv layers, {n_params} params")

        def encode(ts):
            out, _ = _gang_encode(ts, WAVELET, 5, "periodization", 50.0)
            return out

        t0 = time.time()
        t_encode = measure(jax.jit(encode), tensors,
                           row="resnet18_checkpoint_encode_ms", detail=detail)
        log(f"gang encode (bior4.4 L5 t=0.5, all 20 layers): "
            f"{t_encode*1e3:.2f} ms (setup {time.time()-t0:.0f}s)")

        counts = tuple(int(np.prod(s) * 0.47808) for s in shapes)  # t=0.5
        t0 = time.time()
        t_min = measure(jax.jit(lambda ts: _gang_min(ts, counts)[0]),
                        tensors, row="min_weight_gang_ms", detail=detail)
        log(f"gang min-weight (20 layers, 47.8% budget): {t_min*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")

        rkey = jax.random.PRNGKey(0)
        t0 = time.time()
        t_rand = measure(
            jax.jit(lambda ts: _gang_random(rkey, ts, counts)[0]), tensors,
            row="random_gang_ms", detail=detail)
        log(f"gang random (20 layers, matched counts): {t_rand*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        return detail

    if section == "prune":
        from wavelettransforms_tpu.prune.dwt_prune import dwt_prune_tensor

        x2 = _big_input()[0]

        @jax.jit
        def prune_big(v):
            out, _ = dwt_prune_tensor(v, WAVELET, 4, 50.0)
            return out

        t0 = time.time()
        t_prune = measure(prune_big, x2,
                          row="full_prune_ms_4096x4096_L4", detail=detail)
        log(f"4096^2 L4 full prune: {t_prune*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")

        # ragged periodization (odd dims -> circular-extension valid-kernel
        # path; the XLA fallback these shapes used to take is ~22x slower);
        # jit retraces prune_big per input shape, so the same wrapper serves
        xr = x2[:-1, :-1]
        t0 = time.time()
        t_rag = measure(prune_big, xr,
                        row="ragged_prune_ms_4095x4095_L4", detail=detail)
        log(f"4095^2 L4 ragged full prune: {t_rag*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        return detail

    if section == "prune_sym":
        # multi-level symmetric full prune (valid-mode kernels + virtual
        # mosaic-padding percentile) — parity target: the periodization
        # full-prune number
        from wavelettransforms_tpu.prune.dwt_prune import dwt_prune_tensor

        x2 = _big_input()[0]

        @jax.jit
        def prune_big_sym(v):
            out, _ = dwt_prune_tensor(v, WAVELET, 4, 50.0, mode="symmetric")
            return out

        t0 = time.time()
        t_sym = measure(prune_big_sym, x2,
                        row="symmetric_full_prune_ms_4096x4096_L4",
                        detail=detail)
        log(f"4096^2 L4 symmetric full prune: {t_sym*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        return detail

    if section == "modes":
        from wavelettransforms_tpu.ops.pallas import filterbank as fb

        x = _big_input()

        def rt_sym(v):
            # zero-copy tile-padded pipeline (the prune path's kernels):
            # no subband slices / synthesis prep pads — measured 1.45 ms vs
            # 1.83 for the plain mode path at this shape
            coeffs, shapes = fb.wavedec2_pallas_mode(v, WAVELET, 1,
                                                     "symmetric",
                                                     padded=True)
            out = fb.waverec2_pallas_mode(coeffs, WAVELET, "symmetric",
                                          true_shapes=shapes)
            return out[:, :N, :N]

        t0 = time.time()
        t_sym = measure(rt_sym, x, row="symmetric_roundtrip_ms",
                        detail=detail)
        log(f"symmetric-mode roundtrip: {t_sym*1e3:.3f} ms "
            f"(setup {time.time()-t0:.0f}s)")

        x16 = x.astype(jnp.bfloat16)

        def rt16(v):
            return fb.idwt2_level_pallas(
                *fb.dwt2_level_pallas(v, WAVELET), WAVELET)

        t0 = time.time()
        t_bf16 = measure(rt16, x16, row="bf16_roundtrip_ms", detail=detail)
        log(f"bf16 roundtrip: {t_bf16*1e3:.3f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        return detail

    if section == "eval":
        # chip-measured eval forward (the reference's second hot loop,
        # /root/reference/ResNet/testing_suite/eval_model.py:32): jitted
        # flax ResNet-18 inference throughput on a SYNTHETIC 224^2 batch
        # (random init / random pixels — labeled; no pretrained weights or
        # ImageNet are available offline).  The committed metrics files'
        # 6.74 images/s figure is a CPU-backend run; this is the TPU number.
        from wavelettransforms_tpu.models import create_model

        model = create_model("resnet18")
        batch = 64
        rng = np.random.default_rng(7)
        images = jnp.asarray(rng.standard_normal(
            (batch, 224, 224, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])

        @jax.jit
        def fwd_chain(imgs):
            logits = model.apply(variables, imgs)
            # data-dependent, non-foldable feedback so chain_bench's
            # dispatch chain forces every forward to execute
            return imgs + jnp.tanh(jnp.sum(logits)) * 1e-12

        t0 = time.time()
        t_fwd = measure(fwd_chain, images,
                        row="eval_forward_ms_per_batch64_224", detail=detail)
        ips = batch / t_fwd
        log(f"eval forward (ResNet-18, batch 64 @ 224^2, synthetic): "
            f"{t_fwd*1e3:.2f} ms/batch -> {ips:.0f} images/s "
            f"(setup {time.time()-t0:.0f}s)")
        detail["eval_images_per_s_tpu"] = round(ips, 1)
        detail["eval_forward_synthetic"] = True
        return detail

    raise SystemExit(f"unknown section {section!r}")


def _assemble(detail: dict, backend, failed: list, skipped: list) -> dict:
    gbs = detail.get("roundtrip_gbs")
    t_pallas = detail.get("roundtrip_ms_4096x4096_bior44")
    t_xla = detail.get("xla_conv_roundtrip_ms")
    d = {k: v for k, v in detail.items() if k != "roundtrip_gbs"}
    if failed:
        d["sections_failed"] = list(failed)
    if skipped:
        d["sections_skipped"] = list(skipped)
    return {
        "metric": "dwt_idwt_fused_roundtrip_throughput",
        # null (not 0.0) when the core section produced no number — a
        # downstream consumer must be able to tell "failed" from "slow".
        "value": gbs if gbs is not None else None,
        "unit": "GB/s/chip",
        "vs_baseline": (round(t_xla / t_pallas, 2)
                        if t_pallas and t_xla else None),
        "backend": backend,
        "detail": d,
    }


def main():
    # Parent: spawn one subprocess per section under a global deadline,
    # persist + print the cumulative JSON after every section.
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    deadline = time.time() + budget
    here = os.path.dirname(os.path.abspath(__file__))
    partial_path = os.path.join(here, "bench_partial.json")
    detail: dict = {}
    backend = None
    failed: list = []
    skipped: list = []
    env = dict(os.environ)

    def emit():
        result = _assemble(detail, backend, failed, skipped)
        tmp = partial_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        os.replace(tmp, partial_path)
        print(json.dumps(result), flush=True)
        return result

    emit()  # a parseable line exists from second zero
    for i, section in enumerate(SECTIONS):
        if i:
            # settle: device work can outlive the previous section's client;
            # a section that starts against a draining chip measures
            # systematically slow (observed 9x on the symmetric roundtrip).
            # Later sections settle longer — r04's contaminated rows were
            # all in the tail sections (modes: 5-10x slow vs warm smoke).
            time.sleep(6 + 2 * i)
        remaining = deadline - time.time()
        if remaining < MIN_SECTION_S:
            log(f"[{section}] SKIPPED ({remaining:.0f}s left "
                f"< {MIN_SECTION_S:.0f}s floor)")
            skipped.append(section)
            emit()
            continue
        timeout = min(remaining - 5.0, MAX_SECTION_S)
        t0 = time.time()
        log(f"[{section}] starting (timeout {timeout:.0f}s, "
            f"{remaining:.0f}s budget left)")
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--section", section],
                cwd=here, capture_output=True, text=True, timeout=timeout,
                env=env)
        except subprocess.TimeoutExpired as e:
            log(f"[{section}] TIMED OUT after {time.time()-t0:.0f}s; "
                f"stderr tail: {(e.stderr or '')[-400:]}")
            failed.append(section)
            emit()
            continue
        for line in (proc.stderr or "").splitlines():
            log(f"[{section}] {line}")
        if proc.returncode != 0:
            log(f"[{section}] FAILED (exit {proc.returncode})")
            failed.append(section)
            emit()
            continue
        try:
            sec = json.loads(proc.stdout.strip().splitlines()[-1])
            backend = sec.pop("backend", backend)
            detail.update(sec)
        except Exception as e:
            log(f"[{section}] unparseable output: {e}")
            failed.append(section)
        log(f"[{section}] done in {time.time()-t0:.0f}s")
        emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        out = run_section(sys.argv[2])
        print(json.dumps(out), flush=True)
    else:
        main()
