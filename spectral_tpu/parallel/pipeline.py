"""End-to-end throughput pipeline: decode -> device compute -> PNG encode.

BASELINE.json config 5: "10k-clip dataset end-to-end (decode -> fused STFT ->
colormap -> PNG)". The reference's analog is a serial matplotlib loop
(ExportManager.py:146). Here the three stages overlap:

  stage 1 (producer thread): file decode / array staging, prefetched ahead;
  stage 2 (device):       batched fused pipeline, async dispatch — the next
                          batch uploads while the current one computes;
  stage 3 (host threads): packed-pixel unpack + PNG encode (zlib releases
                          the GIL in both the native and PIL encoders).

Bounded queues keep memory flat; the device never waits on the host for
steady-state workloads.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np

from spectral_tpu.config import SpecConfig


@dataclass
class PipelineStats:
    clips: int = 0
    batches: int = 0
    pngs_written: int = 0
    seconds_audio: float = 0.0


def _batched(it: Iterator[Tuple[str, np.ndarray]], batch: int, n: int
             ) -> Iterator[Tuple[List[str], np.ndarray]]:
    names, bufs = [], []
    for name, x in it:
        x = np.asarray(x, np.float32)
        if x.shape[0] < n:
            x = np.pad(x, (0, n - x.shape[0]))
        names.append(name)
        bufs.append(x[:n])
        if len(names) == batch:
            yield names, np.stack(bufs)
            names, bufs = [], []
    if names:
        pad = batch - len(names)
        bufs += [np.zeros(n, np.float32)] * pad
        yield names, np.stack(bufs)


def export_spectrograms(clips: Iterable[Tuple[str, np.ndarray]], fs: float,
                        cfg: SpecConfig, out_dir: str, *,
                        clip_samples: int, batch: int = 32,
                        colormap: str = "jet", compress_level: int = 3,
                        use_pallas: bool = False,
                        encode_workers: int = 4,
                        prefetch: int = 2,
                        rgb_only: bool = True) -> PipelineStats:
    """Stream (name, signal) pairs through the device pipeline into PNGs.

    clip_samples fixes the static shape (shorter clips are zero-padded,
    longer ones truncated — stream_spectrogram covers long-form audio).
    rgb_only drops the (always-opaque) alpha plane before encoding — 25-40%
    less host encode work, which is the binding stage on few-core hosts.
    """
    import jax
    import jax.numpy as jnp
    from spectral_tpu.ops.colormap import unpack_rgba
    from spectral_tpu.render.png import encode_png
    from spectral_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if use_pallas:
        try:
            from spectral_tpu.ops.stft_pallas import (pallas_pipeline_fn,
                                                      pallas_supported)
            if not pallas_supported(cfg):
                raise ValueError
            fn = jax.jit(lambda x: pallas_pipeline_fn(
                fs, cfg, colormap=colormap)(x)["rgb_packed"])
        except Exception:
            use_pallas = False
    if not use_pallas:
        from spectral_tpu.parallel.sharding import batched_spectrogram_fn
        fn = jax.jit(lambda x: batched_spectrogram_fn(
            fs, cfg, use_matmul=True, colormap=colormap)(x)["rgb_packed"])

    os.makedirs(out_dir, exist_ok=True)
    stats = PipelineStats()
    stage_q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    producer_error: list = []

    def producer():
        try:
            for names, xb in _batched(iter(clips), batch, clip_samples):
                # async dispatch: upload + compute overlap with consumer
                packed = fn(jnp.asarray(xb))
                stage_q.put((names, packed))
        except BaseException as e:  # re-raised in the consumer
            producer_error.append(e)
        finally:
            stage_q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    with cf.ThreadPoolExecutor(max_workers=encode_workers) as pool:
        futures = []
        while True:
            item = stage_q.get()
            if item is None:
                break
            names, packed = item
            host = unpack_rgba(np.asarray(packed))  # blocks on this batch only
            if rgb_only:
                host = np.ascontiguousarray(host[..., :3])
            stats.batches += 1
            for i, name in enumerate(names):
                path = os.path.join(out_dir, f"{name}.png")
                futures.append(pool.submit(encode_png, host[i], path,
                                           compress_level))
                stats.clips += 1
                stats.seconds_audio += clip_samples / fs
            for f in list(futures):
                if f.done():
                    f.result()
                    futures.remove(f)
                    stats.pngs_written += 1
        for f in futures:
            f.result()
            stats.pngs_written += 1
    t.join()
    if producer_error:
        raise producer_error[0]
    return stats


def wav_clip_source(paths: Sequence[str]) -> Iterator[Tuple[str, np.ndarray]]:
    """Decode WAV files into (stem, mono float32) pairs."""
    from spectral_tpu.io.wav import read_wav
    for p in paths:
        x, _fs = read_wav(p)
        if x.ndim == 2:
            x = x.mean(axis=1)
        yield os.path.splitext(os.path.basename(p))[0], x
