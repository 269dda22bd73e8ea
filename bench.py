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
    -> modes.

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

SECTIONS = ("core", "gang", "prune", "prune_sym", "modes")
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


def measure(fn, x, spread_out: list | None = None):
    """chain_bench with one re-measure when the run is NOISY (spread > 50%
    across slope repeats): a section that starts while the chip is still
    draining the previous section's chains reads systematically slow (a
    driver run recorded 16.8 ms for a 1.8 ms symmetric roundtrip).  Keeps
    the faster median of the two runs."""
    from wavelettransforms_tpu.utils.profiling import chain_bench

    sp: list = []
    t = retry(lambda: chain_bench(fn, x, spread_out=sp))
    if sp[-1] > 0.5:
        log(f"noisy measurement (spread {sp[-1]*100:.0f}%), re-measuring")
        sp2: list = []
        t2 = retry(lambda: chain_bench(fn, x, spread_out=sp2))
        if t2 < t:
            t, sp = t2, sp2
    if spread_out is not None:
        spread_out.append(sp[-1])
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
        t_pallas = measure(roundtrip, x, spread_out=spreads)
        gbs = 2 * 2 * nbytes / t_pallas / 1e9
        log(f"fused roundtrip {WAVELET} L1 {N}^2: {t_pallas*1e3:.3f} ms "
            f"-> {gbs:.1f} GB/s (spread {spreads[-1]*100:.1f}%, "
            f"setup {time.time()-t0:.0f}s)")
        detail["roundtrip_ms_4096x4096_bior44"] = round(t_pallas * 1e3, 3)
        detail["roundtrip_gbs"] = round(gbs, 1)
        detail["roundtrip_spread_pct"] = round(spreads[-1] * 100, 1)

        xla_roundtrip = jax.jit(lambda v: dj.waverec2_packed(
            dj.wavedec2_packed(v[0], WAVELET, 1), WAVELET, 1, N, N)[None])
        t0 = time.time()
        t_xla = measure(xla_roundtrip, x)
        log(f"XLA-conv roundtrip: {t_xla*1e3:.3f} ms -> "
            f"{2*2*nbytes/t_xla/1e9:.1f} GB/s (setup {time.time()-t0:.0f}s)")
        detail["xla_conv_roundtrip_ms"] = round(t_xla * 1e3, 3)
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
        t_encode = measure(jax.jit(encode), tensors)
        log(f"gang encode (bior4.4 L5 t=0.5, all 20 layers): "
            f"{t_encode*1e3:.2f} ms (setup {time.time()-t0:.0f}s)")
        detail["resnet18_checkpoint_encode_ms"] = round(t_encode * 1e3, 2)

        counts = tuple(int(np.prod(s) * 0.47808) for s in shapes)  # t=0.5
        t0 = time.time()
        t_min = measure(jax.jit(lambda ts: _gang_min(ts, counts)[0]),
                        tensors)
        log(f"gang min-weight (20 layers, 47.8% budget): {t_min*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["min_weight_gang_ms"] = round(t_min * 1e3, 2)

        rkey = jax.random.PRNGKey(0)
        t0 = time.time()
        t_rand = measure(
            jax.jit(lambda ts: _gang_random(rkey, ts, counts)[0]), tensors)
        log(f"gang random (20 layers, matched counts): {t_rand*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["random_gang_ms"] = round(t_rand * 1e3, 2)
        return detail

    if section == "prune":
        from wavelettransforms_tpu.prune.dwt_prune import dwt_prune_tensor

        x2 = _big_input()[0]

        @jax.jit
        def prune_big(v):
            out, _ = dwt_prune_tensor(v, WAVELET, 4, 50.0)
            return out

        t0 = time.time()
        t_prune = measure(prune_big, x2)
        log(f"4096^2 L4 full prune: {t_prune*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["full_prune_ms_4096x4096_L4"] = round(t_prune * 1e3, 2)

        # ragged periodization (odd dims -> circular-extension valid-kernel
        # path; the XLA fallback these shapes used to take is ~22x slower);
        # jit retraces prune_big per input shape, so the same wrapper serves
        xr = x2[:-1, :-1]
        t0 = time.time()
        t_rag = measure(prune_big, xr)
        log(f"4095^2 L4 ragged full prune: {t_rag*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["ragged_prune_ms_4095x4095_L4"] = round(t_rag * 1e3, 2)
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
        t_sym = measure(prune_big_sym, x2)
        log(f"4096^2 L4 symmetric full prune: {t_sym*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["symmetric_full_prune_ms_4096x4096_L4"] = round(t_sym * 1e3, 2)
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
        t_sym = measure(rt_sym, x)
        log(f"symmetric-mode roundtrip: {t_sym*1e3:.3f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["symmetric_roundtrip_ms"] = round(t_sym * 1e3, 3)

        x16 = x.astype(jnp.bfloat16)

        def rt16(v):
            return fb.idwt2_level_pallas(
                *fb.dwt2_level_pallas(v, WAVELET), WAVELET)

        t0 = time.time()
        t_bf16 = measure(rt16, x16)
        log(f"bf16 roundtrip: {t_bf16*1e3:.3f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["bf16_roundtrip_ms"] = round(t_bf16 * 1e3, 3)
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
            # systematically slow (observed 9x on the symmetric roundtrip)
            time.sleep(6)
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
