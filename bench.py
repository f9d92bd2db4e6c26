#!/usr/bin/env python
"""Benchmark: batched fused spectrogram pipeline throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-hours/min", "vs_baseline": N}

Workload: BASELINE.json config-1 shape — 10 s @ 16 kHz clips, n_fft=1024,
hop=256, Hann — run as a batch through the fused on-device pipeline
(frame -> matmul-DFT STFT -> PSD -> normalize -> dB -> arithmetic colormap),
with completion forced by a checksum readback. Baseline: the reference's
measured single-core CPU STFT throughput on the same config,
17.9 audio-hours/min (BASELINE.md; scipy code path PlotEngine.py:113 with
Hann/hop=256).

The timed region keeps everything on device (the driver's interest is chip
throughput; host PNG encode is benchmarked separately in tools/bench_report).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_AUDIO_H_PER_MIN = 17.9


def _preflight_backend() -> None:
    """Probe accelerator init in a subprocess; fall back to CPU if the
    tunnel is down.

    The axon tunnel can go fully DOWN (observed 2026-08-17/18): backend
    init blocks 25-50 min and then raises UNAVAILABLE. Without this guard
    the driver's round-end bench run records a crash instead of a number.
    The probe runs in a SUBPROCESS so a hung init can be killed at the
    timeout without poisoning this process's backend state; on failure the
    bench runs on CPU and says so in the metric string (an honest small
    number beats no artifact). BENCH_INIT_TIMEOUT (s, default 900) bounds
    each attempt; BENCH_INIT_RETRIES (default 1) adds retries; 0 disables
    the preflight entirely (trust the default backend)."""
    from spectral_tpu.utils.backend import probe_backend_init
    timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", "900"))
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "1"))
    if timeout <= 0:
        return
    import jax
    if jax.config.jax_platforms == "cpu":
        # already pinned to CPU (e.g. `spectral-tpu --cpu bench`): probing
        # the real accelerator in a subprocess would be pure waste — and a
        # potential multi-minute block on a downed tunnel
        return
    for attempt in range(1 + retries):
        if attempt:
            # a wedged chip client blocks successors until it fully dies
            # (CLAUDE.md); an immediate retry would hit the same wedge
            time.sleep(60)
        ok, detail = probe_backend_init(timeout)
        if ok:
            return
        print(f"bench preflight: {detail} (attempt {attempt + 1})",
              file=sys.stderr)
    print("bench preflight: accelerator unavailable — falling back to CPU",
          file=sys.stderr)
    import jax
    jax.config.update("jax_platforms", "cpu")


def main() -> int:
    _preflight_backend()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from spectral_tpu.config import SpecConfig
    from spectral_tpu.parallel.sharding import batched_spectrogram_fn
    from spectral_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # tiny-first D2H: the tunnel's per-client transfer setup is
    # per-client, not per-byte (STALL_CAPTURE.json: 938.7 s when the
    # first fetch was 1 MB; ~7 s for 8 int32s) — pay it with the
    # smallest possible fetch so the big warmup below isn't the one
    # sampling it
    from spectral_tpu.utils.backend import warm_transfer_path
    warm_transfer_path()

    clip_seconds = 10.0
    fs = 16000.0
    on_cpu = jax.default_backend() == "cpu"
    # TPU-sized defaults would run for hours on a CPU fallback backend
    batch = int(os.environ.get("BENCH_BATCH", "8" if on_cpu else "1024"))
    n = int(clip_seconds * fs)

    cfg = SpecConfig.north_star(1024, 256, log_scale=True)
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(batch, n).astype(np.float32))

    # Both kernels implement the same window/detrend-folded DFT-as-GEMM.
    # Measured on v5e (r3): the Pallas kernel wins the bare STFT stage
    # (0.0736 vs 0.0804 ms/clip) but XLA wins the full pipeline (0.0867 vs
    # 0.0929 even with in-kernel min/max stats) because it fuses the
    # normalize/dB/colormap tail into its matmul epilogue, which a
    # pallas_call's HBM output boundary cannot. The pipeline default is
    # XLA; BENCH_PALLAS=1 opts into the Pallas-STFT pipeline.
    use_pallas = os.environ.get("BENCH_PALLAS", "0") != "0"
    # flip_image folds the PNG row order into the DFT matrix columns —
    # the production pipeline's kernel (no device-side flip pass)
    img_flipped = True
    fn_raw = batched_spectrogram_fn(fs, cfg, use_matmul=True, colormap="jet",
                                    flip_image=True)
    if use_pallas:
        try:
            from spectral_tpu.ops.stft_pallas import pallas_pipeline_fn
            fn_raw = pallas_pipeline_fn(fs, cfg, colormap="jet")
            img_flipped = False
        except Exception:
            use_pallas = False

    # Remote dev runtimes add O(100 ms) latency per dispatch and
    # block_until_ready is not a reliable barrier there, so: K sub-batches
    # run inside one dispatch (lax.map; sub-batch i is a rescaled view of
    # the staged batch, so HBM holds one input), each sub-batch's packed
    # image is reduced to a checksum on device, and one scalar readback
    # forces completion of everything.
    #
    # Regression-proofing (round-4): a 2-rep single number cannot tell a
    # code regression from a bad tunnel day (r2->r3 read as a 17% "loss"
    # that no on-chip kernel measurement reproduced). So: >=5 timed reps,
    # each rep individually wall-clocked, and the JSON carries
    # median/min/max/spread plus the tunnel's same-day dispatch floor
    # (trivial program + scalar readback — the per-rep overhead a slow
    # tunnel adds) and the compile-cache state. The headline value is the
    # MEDIAN rep; `value_best` (min) is the least tunnel-contaminated.
    reps = int(os.environ.get("BENCH_REPS", "2" if on_cpu else "5"))
    K = int(os.environ.get("BENCH_SUBBATCHES", "2" if on_cpu else "16"))

    def one(x, i):
        # closing over the batch would embed 100s of MB as a program
        # constant (rejected by remote compile services); pass it in
        packed = fn_raw(x * (1.0 + 0.05 * i.astype(jnp.float32)))["rgb_packed"]
        return jnp.sum(packed.astype(jnp.float32))

    many_j = jax.jit(
        lambda x: jnp.sum(jax.lax.map(lambda i: one(x, i), jnp.arange(K))))
    t_compile0 = time.time()
    checksum = float(many_j(xb))  # warm: compile + first device->host xfer
    warmup_s = time.time() - t_compile0
    assert checksum == checksum  # not NaN

    # same-day dispatch floor: trivial jitted program + scalar readback,
    # best of 5 — the fixed per-rep cost the tunnel imposes on ANY kernel
    triv = jax.jit(lambda s: s + 1.0)
    float(triv(jnp.float32(0.0)))  # compile
    floor_ms = min(
        (lambda t0: (float(triv(jnp.float32(i))), time.time() - t0)[1])(
            time.time())
        for i in range(5)) * 1e3

    rep_s = []
    for _ in range(reps):
        t0 = time.time()
        float(many_j(xb))
        rep_s.append(time.time() - t0)
    rep_s_sorted = sorted(rep_s)
    median_s = rep_s_sorted[len(rep_s) // 2] if reps % 2 else (
        rep_s_sorted[reps // 2 - 1] + rep_s_sorted[reps // 2]) / 2.0
    spread_pct = 100.0 * (rep_s_sorted[-1] - rep_s_sorted[0]) / median_s

    audio_hours_per_rep = K * batch * clip_seconds / 3600.0
    ahpm = audio_hours_per_rep / (median_s / 60.0)
    ahpm_best = audio_hours_per_rep / (rep_s_sorted[0] / 60.0)

    # Accuracy artifacts: max |dB| error vs a float64 scipy oracle on one
    # clip (scipy is a bench/test oracle only, never a package dependency).
    # The display image is min-max rescaled to [0, 1], so the error maps
    # back to dB via the image's dB range. Three driver-captured points:
    #   * the exact kernel being timed (headline config, 'accurate' tier);
    #   * the scipy-compat nperseg=8192 config — the f32-accumulation worst
    #     case of the 1e-3 dB contract (core/stft.matmul_precision);
    #   * the 'fast' (bf16 3-pass) tier at the headline config — the
    #     ~5e-2 dB display-only claim.
    max_db_err = err_8192 = err_fast = None
    try:
        # scipy here is the ACCURACY ORACLE the driver artifact is defined
        # against — the same role it plays in tests. The "scipy is a
        # test/bench oracle only" rule (CLAUDE.md) bars it from the
        # spectral_tpu package, not from this driver script.
        from scipy.signal import spectrogram as sp_spec

        def db_image_err(dev_img, x64, **sp_kw):
            _f, _t, sxx = sp_spec(x64, fs=fs, scaling="density", mode="psd",
                                  **sp_kw)
            norm = np.clip(sxx / (sxx.max() + 1e-20), 0.0, 1.0)
            db = np.nan_to_num(10.0 * np.log10(norm + 1e-12))
            rng_db = db.max() - db.min()
            oracle_img = (db - db.min()) / rng_db
            return round(float(np.max(np.abs(dev_img - oracle_img))
                               * rng_db), 6)

        x0 = np.asarray(xb[0], np.float64)
        # fn_raw's image is display-flipped on the XLA path (flip_image;
        # bitwise the flip of the unflipped image) — unflip for the oracle
        dev_img = np.asarray(jax.jit(
            lambda x: fn_raw(x)["image"])(xb[:1]))[0]
        if img_flipped:
            dev_img = dev_img[::-1]
        max_db_err = db_image_err(dev_img, x0, window="hann", nperseg=1024,
                                  noverlap=1024 - 256, nfft=1024,
                                  detrend=False)

        cfg8k = SpecConfig.scipy_default(8192, log_scale=True)
        img8k = np.asarray(jax.jit(lambda x: batched_spectrogram_fn(
            fs, cfg8k, use_matmul=True, colormap=None)(x)["image"])(
            xb[:1]))[0]
        err_8192 = db_image_err(img8k, x0, nperseg=8192)

        cfg_fast = SpecConfig.north_star(1024, 256, log_scale=True,
                                         precision="fast")
        img_fast = np.asarray(jax.jit(lambda x: batched_spectrogram_fn(
            fs, cfg_fast, use_matmul=True, colormap=None)(x)["image"])(
            xb[:1]))[0]
        err_fast = db_image_err(img_fast, x0, window="hann", nperseg=1024,
                                noverlap=1024 - 256, nfft=1024,
                                detrend=False)
    except Exception:
        pass

    from spectral_tpu.utils.cache import compilation_cache_dir
    cache_dir = compilation_cache_dir()
    print(json.dumps({
        "metric": ("spectrogram pipeline throughput "
                   f"(n_fft=1024, hop=256, batch={batch}, 10s@16kHz, "
                   f"backend={jax.default_backend()}, "
                   f"kernel={'pallas' if use_pallas else 'xla'})"),
        "value": round(ahpm, 1),
        "unit": "audio-hours/min",
        "vs_baseline": round(ahpm / BASELINE_AUDIO_H_PER_MIN, 1),
        "value_best": round(ahpm_best, 1),
        "vs_baseline_best": round(ahpm_best / BASELINE_AUDIO_H_PER_MIN, 1),
        "reps": reps,
        "rep_seconds": [round(s, 4) for s in rep_s],
        "spread_pct": round(spread_pct, 1),
        "dispatch_floor_ms": round(floor_ms, 1),
        "warmup_s": round(warmup_s, 1),
        "compile_cache": cache_dir,
        "max_db_err_vs_scipy": max_db_err,
        "max_db_err_8192_scipy_compat": err_8192,
        "max_db_err_fast_tier": err_fast,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
