"""Sharded batch pipelines (pjit / NamedSharding).

The throughput workloads (BASELINE.json config 5: 10k clips end-to-end across
a v5e-8) are embarrassingly parallel over clips: shard the batch dimension
over the 'data' mesh axis and let every chip run the fused
STFT -> scale -> colormap pipeline on its shard. The only cross-chip
communication is the optional shared normalization maximum (the reference's
``global_max`` parameter, PlotEngine.py:78,110,126), which XLA lowers to an
ICI all-reduce when requested.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.scale import normalize_batch
from spectral_tpu.core.stft import power_spectrogram_fm
from spectral_tpu.core.mel import mel_filterbank
from spectral_tpu.ops.colormap import apply_colormap_packed

Array = jax.Array


def batched_spectrogram_fn(fs: float, cfg: SpecConfig, *,
                           use_matmul: bool = True,
                           colormap: Optional[str] = "jet",
                           share_max: bool = False):
    """Build the per-shard batch pipeline (B, n) -> dict of outputs.

    Returns a plain jax-traceable function; wrap with jit/pjit via
    :func:`shard_pipeline` or call directly under vmap.
    """
    n_mels = cfg.n_mels

    def fn(xb: Array):
        # freq-major spine: the display/mel consumers want (B, F, T), and
        # power_spectrogram_fm folds that transpose into the dense DFT
        # contraction (chip: 0.0906 -> 0.0803 ms/clip on the headline
        # pipeline). The frame-major "psd" output transposes back — a cost
        # only paid when a caller actually consumes it (XLA DCEs it away
        # under jit otherwise), exactly mirroring the old layout's cost
        # when the image was consumed.
        psd_fm = power_spectrogram_fm(xb, fs, cfg,
                                      use_matmul=use_matmul)  # (B, F, T)
        out = {"psd": jnp.swapaxes(psd_fm, -1, -2)}
        if n_mels:
            fb = mel_filterbank(n_mels, psd_fm.shape[-2], fs, cfg.mel_fmin,
                                cfg.mel_fmax, cfg.mel_htk)
            mel_fm = jnp.einsum("mf,...ft->...mt",
                                jnp.asarray(fb, psd_fm.dtype), psd_fm,
                                precision=jax.lax.Precision.HIGHEST)
            out["mel"] = jnp.swapaxes(mel_fm, -1, -2)
        base_fm = mel_fm if n_mels else psd_fm
        img = normalize_batch(base_fm, cfg.log_scale, share_max)
        out["image"] = img
        if colormap:
            out["rgb_packed"] = apply_colormap_packed(img, colormap,
                                                      flip_rows=True)
        return out

    return fn


def shard_pipeline(mesh: Mesh, fs: float, cfg: SpecConfig, *,
                   use_matmul: bool = True,
                   colormap: Optional[str] = "jet",
                   share_max: bool = False,
                   batch_axis: str = "data"):
    """jit the batch pipeline with the batch dim sharded over `batch_axis`.

    The batch size must be divisible by the mesh axis size.
    """
    from spectral_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    fn = batched_spectrogram_fn(fs, cfg, use_matmul=use_matmul,
                                colormap=colormap, share_max=share_max)
    in_sh = NamedSharding(mesh, P(batch_axis))
    out_sh = NamedSharding(mesh, P(batch_axis))
    return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)


def global_max_psd(psd_sharded: Array) -> Array:
    """Shared normalization base across a sharded batch (ICI all-reduce)."""
    return jnp.max(psd_sharded)
