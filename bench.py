#!/usr/bin/env python
"""Benchmark: batched fused spectrogram pipeline throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-hours/min", "vs_baseline": N}

Workload: BASELINE.json config-1 shape — 10 s @ 16 kHz clips, n_fft=1024,
hop=256, Hann — run as a batch through the fused on-device pipeline
(frame -> matmul-DFT STFT -> PSD -> normalize -> dB -> colormap LUT gather),
timed end-of-pipe with block_until_ready. Baseline: the reference's measured
single-core CPU STFT throughput on the same config, 17.9 audio-hours/min
(BASELINE.md; scipy code path PlotEngine.py:113 with Hann/hop=256).

The timed loop keeps everything on device (the driver's interest is chip
throughput; host PNG encode is benchmarked separately in tools/bench_report).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_AUDIO_H_PER_MIN = 17.9


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from spectral_tpu.config import SpecConfig
    from spectral_tpu.parallel.sharding import batched_spectrogram_fn
    from spectral_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    clip_seconds = 10.0
    fs = 16000.0
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    n = int(clip_seconds * fs)

    cfg = SpecConfig.north_star(1024, 256, log_scale=True)
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(batch, n).astype(np.float32))

    use_pallas = os.environ.get("BENCH_PALLAS", "1") != "0"
    fn_raw = batched_spectrogram_fn(fs, cfg, use_matmul=True, colormap="jet")
    if use_pallas:
        try:
            from spectral_tpu.ops.stft_pallas import pallas_pipeline_fn
            fn_raw = pallas_pipeline_fn(fs, cfg, colormap="jet")
        except Exception:
            use_pallas = False

    # All reps run inside ONE dispatch (lax.map over sub-batches): remote
    # runtimes add O(100 ms) latency per dispatch, which is a property of
    # the dev tunnel, not the chip. Every sub-batch's packed RGB image is a
    # real HBM output; completion is forced by reading back a checksum that
    # depends on each sub-batch (block_until_ready is not a reliable
    # barrier on every remote runtime).
    reps = int(os.environ.get("BENCH_REPS", "20"))

    def many(xs):
        return jax.lax.map(lambda x: fn_raw(x)["rgb_packed"], xs)

    many_j = jax.jit(many)
    checksum_j = jax.jit(lambda o: jnp.sum(o[:, 0, 0, 0].astype(jnp.float32)))
    xs = jnp.stack([xb if i % 2 == 0 else xb * 0.5 for i in range(reps)])
    # warm: compiles for BOTH programs + first device->host transfer — all
    # excluded from the timed region
    float(checksum_j(many_j(xs)))

    t0 = time.time()
    checksum = float(checksum_j(many_j(xs)))
    dt = (time.time() - t0) / reps
    assert checksum == checksum  # not NaN

    audio_hours = batch * clip_seconds / 3600.0
    ahpm = audio_hours / (dt / 60.0)

    print(json.dumps({
        "metric": ("spectrogram pipeline throughput "
                   f"(n_fft=1024, hop=256, batch={batch}, 10s@16kHz, "
                   f"backend={jax.default_backend()}, "
                   f"kernel={'pallas' if use_pallas else 'xla'})"),
        "value": round(ahpm, 1),
        "unit": "audio-hours/min",
        "vs_baseline": round(ahpm / BASELINE_AUDIO_H_PER_MIN, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
