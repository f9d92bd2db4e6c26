"""Fused Pallas STFT kernel (TPU).

The hot op of the whole framework (reference code path: scipy spectrogram at
PlotEngine.py:113). One kernel instance computes a block of frames end to end
in VMEM:

    hop-rows of signal (HBM->VMEM via the grid)
      -> overlapped framing (static slices + concat)       [BF, nperseg]
      -> real-DFT as two MXU matmuls against window-folded
         (and detrend-folded) DFT matrices                  [BF, Fpad]
      -> |X|^2 * one-sided/PSD scale                        VPU, fused
      -> optional log10                                     VPU, fused

avoiding the (nperseg/hop)x HBM blowup of materializing frames. Overlap
between adjacent frame blocks is handled by reading TWO adjacent row blocks
per grid step (plain Blocked indexing — no overlapping BlockSpecs needed):
frames in block j start inside rows [j*BF, (j+1)*BF) and extend at most
r-1 = nperseg/hop - 1 rows past it, which the second block covers since
r - 1 <= BF.

The matmul-DFT trades ~40x the FLOPs of an rFFT for MXU throughput and
fusion (GEMM-native NDFT, cf. the MelT paper in PAPERS.md) — the op stays
memory-bound on v5e, so the extra FLOPs are free.

Constraints: hop | nperseg and nfft == nperseg (north-star configs; the jnp
path covers the rest), and the two DFT matrices must fit VMEM (nperseg <=
1024 at f32 — larger FFTs fall back to the jnp path until frequency tiling
lands).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.stft import dft_matrices, num_frames, onesided_weights

Array = jax.Array

LANE = 128
MAX_NPERSEG_VMEM = 1024  # 2 matrices: 2 * 1024 * 640 * 4 B = 5.2 MB


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _padded_consts(cfg: SpecConfig, fs: float):
    """(A_re, A_im, weights) with the frequency axis padded to a lane
    multiple. Window + constant detrend are folded into the matrices
    (core.stft.dft_matrices)."""
    a_re, a_im = dft_matrices(cfg)   # (nperseg, F) float64
    wts = onesided_weights(cfg, fs)  # (F,)
    F = a_re.shape[1]
    Fp = _round_up(F, LANE)
    pad = ((0, 0), (0, Fp - F))
    hop = cfg.hop_
    r = cfg.nperseg // hop
    # reshape to per-hop-piece stacks: frames @ A == sum_k piece_k @ A[k]
    a_re = np.pad(a_re, pad).astype(np.float32).reshape(r, hop, Fp)
    a_im = np.pad(a_im, pad).astype(np.float32).reshape(r, hop, Fp)
    return a_re, a_im, np.pad(wts, (0, Fp - F)).astype(np.float32)


def pallas_supported(cfg: SpecConfig) -> bool:
    return (cfg.nperseg % cfg.hop_ == 0
            and cfg.nfft_ == cfg.nperseg
            and cfg.nperseg <= MAX_NPERSEG_VMEM
            and cfg.nperseg // cfg.hop_ >= 1)


def stft_psd_pallas(x: Array, fs: float, cfg: SpecConfig,
                    block_frames: int = 128,
                    log10_out: bool = False,
                    interpret: Optional[bool] = None) -> Array:
    """Fused PSD spectrogram: (n,) or (B, n) -> (B?, T, F) float32.

    Matches core.stft.power_spectrogram (and scipy) for supported configs.
    interpret=None auto-selects interpreter mode off-TPU (tests).
    """
    if x.ndim == 1:
        return stft_psd_pallas(x[None], fs, cfg, block_frames, log10_out,
                               interpret)[0]
    if not pallas_supported(cfg):
        raise ValueError(
            "config unsupported by the pallas kernel (need hop | nperseg, "
            f"nfft == nperseg, nperseg <= {MAX_NPERSEG_VMEM}); "
            "use core.stft.power_spectrogram")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nperseg, hop = cfg.nperseg, cfg.hop_
    r = nperseg // hop

    B, n = x.shape
    T = num_frames(n, nperseg, hop)
    if T <= 0:
        return jnp.zeros((B, 0, cfg.n_freqs), jnp.float32)

    a_re, a_im, wts = _padded_consts(cfg, fs)
    Fp = a_re.shape[2]
    F = cfg.n_freqs

    BF = min(block_frames, _round_up(T, 8))
    if r - 1 > BF:  # overlap must fit in the second row block
        BF = _round_up(r - 1, 8)
    n_blocks = -(-T // BF)
    Tp = n_blocks * BF

    # rows of `hop` samples; (n_blocks + 1) blocks of BF rows so the dual
    # read's j+1 block always exists
    rows_padded = (n_blocks + 1) * BF
    total = rows_padded * hop
    xp = jnp.pad(x, ((0, 0), (0, total - n))) if total > n else x[:, :total]
    rows = xp.reshape(B, rows_padded, hop)

    def kernel(rows_a, rows_b, are_ref, aim_ref, wts_ref, out_ref):
        # frame i of this block = rows[i : i + r] flattened; instead of
        # materializing frames (Mosaic rejects the offset concat), decompose
        # the DFT matmul over hop-pieces and accumulate on the MXU:
        #   frames @ A == sum_k rows[k : k + BF] @ A[k*hop : (k+1)*hop]
        rows2 = jnp.concatenate([rows_a[:, :], rows_b[:, :]], axis=0)
        xr = jnp.zeros((BF, Fp), jnp.float32)
        xi = jnp.zeros((BF, Fp), jnp.float32)
        # NOTE: precision must be explicit — a bare f32 jnp.dot lowers to a
        # single-pass bf16 MXU matmul under Mosaic (measured 18 dB error);
        # HIGHEST selects the multi-pass f32 path (2.7e-4 dB vs scipy) and
        # still runs at ~0.07 ms/clip. Mosaic supports only DEFAULT/HIGHEST.
        prec = (jax.lax.Precision.HIGHEST if cfg.precision == "accurate"
                else jax.lax.Precision.DEFAULT)
        for k in range(r):
            piece = jax.lax.slice(rows2, (k, 0), (k + BF, hop))
            xr = xr + jnp.dot(piece, are_ref[k], precision=prec,
                              preferred_element_type=jnp.float32)
            xi = xi + jnp.dot(piece, aim_ref[k], precision=prec,
                              preferred_element_type=jnp.float32)
        p = (xr * xr + xi * xi) * wts_ref[:, :]
        if log10_out:
            p = jnp.log10(p + 1e-20)
        out_ref[:, :] = p

    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((None, BF, hop), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, BF, hop), lambda b, j: (b, j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, hop, Fp), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, hop, Fp), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, BF, Fp), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Fp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Tp * nperseg * Fp,
            bytes_accessed=(B * total * 4 * 2 + 2 * nperseg * Fp * 4
                            + B * Tp * Fp * 4),
            transcendentals=B * Tp * Fp if log10_out else 0,
        ),
        interpret=interpret,
    )(rows, rows, a_re, a_im, wts[None, :])
    return out[:, :T, :F]


def pallas_pipeline_fn(fs: float, cfg: SpecConfig, *,
                       colormap: Optional[str] = "jet",
                       block_frames: int = 128,
                       interpret: Optional[bool] = None):
    """Full display pipeline with the Pallas kernel as the STFT stage:
    (B, n) -> {psd, image, rgb_packed?}, output-compatible with
    parallel.sharding.batched_spectrogram_fn."""
    from spectral_tpu.core.scale import display_images
    from spectral_tpu.ops.colormap import apply_colormap_packed

    def fn(xb: Array):
        psd = stft_psd_pallas(xb, fs, cfg, block_frames, interpret=interpret)
        out = {"psd": psd, "image": display_images(psd, cfg.log_scale)}
        if colormap:
            out["rgb_packed"] = apply_colormap_packed(out["image"], colormap,
                                                      flip_rows=True)
        return out

    return fn


# ---------------------------------------------------------------------------
# Fully-fused display kernel: STFT -> PSD -> normalize -> dB -> colormap ->
# packed RGBA, one VMEM pass per clip (no HBM round trips between stages).
# ---------------------------------------------------------------------------

MAX_DISPLAY_FRAMES = 1024  # one clip's frames must fit VMEM in one block


def display_supported(cfg: SpecConfig, n: int) -> bool:
    return (pallas_supported(cfg)
            and 0 < num_frames(n, cfg.nperseg, cfg.hop_) <= MAX_DISPLAY_FRAMES)


def stft_display_pallas(x: Array, fs: float, cfg: SpecConfig,
                        colormap: str = "jet",
                        interpret: Optional[bool] = None) -> Array:
    """Whole display pipeline in one kernel: (B, n) -> packed uint32
    (B, F, T) RGBA images, freq-major with row 0 = highest frequency
    (flip_rows convention), equal to
    apply_colormap_packed(normalize(psd.T, cfg.log_scale), flip_rows=True).

    Per-image normalization requires the image's global max, so the grid is
    one block per clip; clips longer than MAX_DISPLAY_FRAMES frames use the
    staged pipeline instead (see display_supported).

    Measured on v5e: 0.100 ms/clip vs 0.085 for the staged XLA pipeline
    (the one-block-per-clip grid pipelines worse than XLA's own fusion of
    the elementwise tail), so the staged path is the production default and
    this kernel is the single-launch alternative for latency-sensitive
    single-dispatch uses.
    """
    from spectral_tpu.ops.colormap import _hinge_coeffs

    if x.ndim == 1:
        return stft_display_pallas(x[None], fs, cfg, colormap, interpret)[0]
    if not display_supported(cfg, x.shape[-1]):
        raise ValueError("config/length unsupported by the fused display "
                         "kernel; use the staged pipeline")
    coeffs = _hinge_coeffs(colormap, 256)
    if coeffs is None:
        raise ValueError(f"colormap {colormap!r} is not arithmetically "
                         "expressible; use the staged pipeline")
    chans, ceps = coeffs
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    nperseg, hop = cfg.nperseg, cfg.hop_
    r = nperseg // hop
    B, n = x.shape
    T = num_frames(n, nperseg, hop)
    a_re, a_im, wts = _padded_consts(cfg, fs)
    Fp = a_re.shape[2]
    F = cfg.n_freqs
    log_scale = cfg.log_scale
    prec = (jax.lax.Precision.HIGHEST if cfg.precision == "accurate"
            else jax.lax.Precision.DEFAULT)

    Tp = _round_up(T, 8)
    rows_needed = Tp + r - 1
    total = rows_needed * hop
    xp = jnp.pad(x, ((0, 0), (0, total - n))) if total > n else x[:, :total]
    rows = xp.reshape(B, rows_needed, hop)

    # static mask of real (frame, freq) cells: padded cells must not
    # influence the per-image max or the dB min-max rescale
    col_ids = np.arange(Fp)[None, :]
    row_ids = np.arange(Tp)[:, None]
    valid = ((col_ids < F) & (row_ids < T)).astype(np.float32)

    def kernel(rows_ref, are_ref, aim_ref, wts_ref, valid_ref, out_ref):
        xr = jnp.zeros((Tp, Fp), jnp.float32)
        xi = jnp.zeros((Tp, Fp), jnp.float32)
        for k in range(r):
            piece = jax.lax.slice(rows_ref[:, :], (k, 0), (k + Tp, hop))
            xr = xr + jnp.dot(piece, are_ref[k], precision=prec,
                              preferred_element_type=jnp.float32)
            xi = xi + jnp.dot(piece, aim_ref[k], precision=prec,
                              preferred_element_type=jnp.float32)
        psd = (xr * xr + xi * xi) * wts_ref[:, :]
        v = valid_ref[:, :]
        neg = jnp.float32(-3.4e38)
        pos = jnp.float32(3.4e38)
        # normalize (PlotEngine.py:126-131): base = image max over real cells
        base = jnp.max(jnp.where(v > 0, psd, neg))
        img = jnp.clip(psd / (base + 1e-20), 0.0, 1.0)
        if log_scale:
            db = 10.0 * jnp.log10(img + 1e-12)
            mn = jnp.min(jnp.where(v > 0, db, pos))
            mx = jnp.max(jnp.where(v > 0, db, neg))
            rng = mx - mn
            img = jnp.where(rng > 1e-6, (db - mn) / jnp.where(rng > 1e-6,
                                                              rng, 1.0),
                            jnp.zeros_like(db))
        # colormap: piecewise-linear channels (see ops.colormap), byte-exact
        idx = jnp.clip((img * 256.0), 0.0, 255.0).astype(jnp.int32)
        fi = idx.astype(jnp.float32)
        packed = jnp.full((Tp, Fp), jnp.uint32(255 << 24))
        for shift, (z0, hinges, corrections) in zip((0, 8, 16), chans):
            z = jnp.full_like(fi, z0)
            for ds, t in hinges:
                z = z + ds * jnp.maximum(fi - t, 0.0)
            b8 = jnp.floor(jnp.clip(z + ceps, 0.0, 255.0)).astype(jnp.int32)
            for i, d in corrections:
                b8 = b8 + jnp.where(idx == i, d, 0)
            packed = packed | (b8.astype(jnp.uint32) << shift)
        out_ref[:, :] = packed

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, rows_needed, hop), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, nperseg // r, Fp), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, nperseg // r, Fp), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, Fp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, Tp, Fp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Fp), jnp.uint32),
        interpret=interpret,
    )(rows, a_re, a_im, wts[None, :], valid)
    # crop, transpose to freq-major, flip so row 0 = highest frequency
    return jnp.flip(jnp.swapaxes(out[:, :T, :F], -1, -2), axis=-2)
