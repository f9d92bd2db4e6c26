"""Chunked streaming STFT with overlap carry.

The reference loads whole recordings into RAM and concatenates sweeps
(PlotEngine.py:193); the long-form workload (BASELINE.json config 4: 1-hour
48 kHz recording) instead streams fixed-size chunks host->HBM with a carry of
trailing samples between chunks, so device memory stays bounded by the chunk
size while frame centers and counts are *identical* to the monolithic
computation (SURVEY.md §5 long-context).

Scheme: with hop h and frame length nperseg, the carry length is
c = (ceil(nperseg/h) - 1) * h  (the smallest multiple of h >= nperseg - h)
and the chunk length m must be a multiple of h. Each step frames
[carry | chunk] at local offsets 0, h, ..., m-h — exactly m/h frames whose
absolute start samples are j*m - c + i*h, i.e. the monolithic hop grid.
Chunk 0's first c/h slots fall before the signal and are masked invalid.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.stft import num_frames, power_spectrogram

Array = jax.Array


def carry_len(cfg: SpecConfig) -> int:
    h = cfg.hop_
    return (math.ceil(cfg.nperseg / h) - 1) * h


class StreamingSTFT:
    """Stateful chunked STFT. Feed equal-sized chunks (multiple of hop);
    receive (frames, valid_mask, first_abs_frame_index) per chunk."""

    def __init__(self, fs: float, cfg: SpecConfig, chunk_size: int,
                 use_matmul: bool = False):
        h = cfg.hop_
        if chunk_size % h != 0:
            raise ValueError(f"chunk_size must be a multiple of hop={h}")
        if chunk_size < cfg.nperseg:
            raise ValueError("chunk_size must be >= nperseg")
        self.cfg = cfg
        self.fs = fs
        self.chunk_size = chunk_size
        self.c = carry_len(cfg)
        self.frames_per_chunk = chunk_size // h
        self._chunk_idx = 0
        self._carry = jnp.zeros(self.c, jnp.float32)

        import dataclasses
        stream_cfg = dataclasses.replace(cfg, center=False, fmin=None,
                                         fmax=None)

        def step(carry: Array, chunk: Array):
            buf = jnp.concatenate([carry, chunk])
            psd = power_spectrogram(buf, fs, stream_cfg,
                                    use_matmul=use_matmul)
            new_carry = buf[chunk.shape[0]:]
            return new_carry, psd

        self._step = jax.jit(step)

    def reset(self) -> None:
        self._chunk_idx = 0
        self._carry = jnp.zeros(self.c, jnp.float32)

    def process(self, chunk: Array) -> Tuple[Array, np.ndarray, int]:
        """One chunk (exactly chunk_size samples) -> (psd (m/h, F), valid
        mask (m/h,), absolute index of this block's first frame slot)."""
        if chunk.shape[-1] != self.chunk_size:
            raise ValueError(
                f"expected chunk of {self.chunk_size}, got {chunk.shape[-1]}")
        self._carry, psd = self._step(self._carry,
                                      jnp.asarray(chunk, jnp.float32))
        h = self.cfg.hop_
        first_abs = self._chunk_idx * self.frames_per_chunk - self.c // h
        valid = np.arange(self.frames_per_chunk) + first_abs >= 0
        self._chunk_idx += 1
        return psd, valid, first_abs


def stream_spectrogram(x, fs: float, cfg: SpecConfig, chunk_size: int,
                       use_matmul: bool = False) -> Array:
    """Host driver: stream a full signal through StreamingSTFT and return
    the frame-major PSD, identical to power_spectrogram(x) (property-tested).

    The final partial chunk is zero-padded and the output trimmed to the
    monolithic frame count (scipy drops trailing partial frames)."""
    x = np.asarray(x, np.float32)
    n = x.shape[-1]
    total_frames = num_frames(n, cfg.nperseg, cfg.hop_)
    s = StreamingSTFT(fs, cfg, chunk_size, use_matmul=use_matmul)
    blocks = []
    n_chunks = max(1, math.ceil(n / chunk_size))
    for j in range(n_chunks):
        chunk = x[j * chunk_size:(j + 1) * chunk_size]
        if chunk.shape[0] < chunk_size:
            chunk = np.pad(chunk, (0, chunk_size - chunk.shape[0]))
        psd, valid, first_abs = s.process(chunk)
        blocks.append(np.asarray(psd)[valid])
    out = np.concatenate(blocks, axis=0)[:total_frames]
    return jnp.asarray(out)


def iter_stream(chunks: Iterator[np.ndarray], fs: float, cfg: SpecConfig,
                chunk_size: int, use_matmul: bool = False
                ) -> Iterator[Tuple[np.ndarray, int]]:
    """Generator form for true streaming sources: yields (psd_block,
    first_abs_frame_index) with invalid slots already dropped — both the
    leading carry region and, for a short final chunk, trailing frames that
    would extend past the real samples (zero-padding is an implementation
    detail, not signal)."""
    s = StreamingSTFT(fs, cfg, chunk_size, use_matmul=use_matmul)
    h = cfg.hop_
    n_seen = 0
    for chunk in chunks:
        chunk = np.asarray(chunk, np.float32)
        n_seen += chunk.shape[0]
        if chunk.shape[0] < chunk_size:
            chunk = np.pad(chunk, (0, chunk_size - chunk.shape[0]))
        psd, valid, first_abs = s.process(chunk)
        abs_idx = first_abs + np.arange(s.frames_per_chunk)
        valid = valid & (abs_idx * h + cfg.nperseg <= n_seen)
        yield np.asarray(psd)[valid], max(first_abs, 0)
