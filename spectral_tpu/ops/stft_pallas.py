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
rp-1 = ceil(nperseg/hop) - 1 rows past it, which the second block covers
since rp - 1 <= BF.

Hops that do NOT divide nperseg (including the reference's own scipy
default hop = nperseg - nperseg//8, PlotEngine.py:113 — e.g. 896 at 1024)
use a gcd decomposition of the same accumulated-matmul framing: with
g = gcd(nperseg, hop), the signal is viewed as rows of g samples, each
frame is P = nperseg/g consecutive rows starting every S = hop/g rows,
and frames @ A == sum_k piece_k @ A[k] over P g-wide pieces, where piece
k = (q, s) of a frame block is the static slice rows[(q, s)] of the
(2*BF, S, g)-shaped dual row block (k = q*S + s). The A matrices keep
exactly nperseg rows — no padding, no extra FLOPs, and the dividing-hop
case degenerates to S = 1 / g = hop (the original kernel).

The matmul-DFT trades ~40x the FLOPs of an rFFT for MXU throughput and
fusion (GEMM-native NDFT, cf. the MelT paper in PAPERS.md) — the op stays
memory-bound on v5e, so the extra FLOPs are free.

For nperseg > 1024 the DFT matrices no longer fit VMEM whole, so the
frequency axis is tiled onto the grid: step (j, f, b) computes frame block j
x frequency tile f of clip b. The batch dimension is INNERMOST so the A-tile
(the big operand) stays VMEM-resident across all clips of a tile — the
signal rows (the small operand) re-stream per tile instead, which costs
nF x signal bytes instead of B x matrix bytes.

Measured on v5e (ms/clip, 10 s @ 16 kHz): the kernel WINS the bare STFT
stage at the headline nperseg=1024 (0.0736 pallas vs 0.0804 xla-matmul vs
0.133 xla-fft) but LOSES the full display pipeline (0.0933 vs 0.0898,
re-measured back-to-back with whole-output checksums after the round-3
timer was found to let XLA slice-sink the colormap tail; the honest
ratio is 1.04, same conclusion as the original 0.0929-vs-0.0867) — XLA
fuses the normalize/dB/colormap tail into its own matmul epilogue, while
a pallas_call output must materialize to HBM first. The in-kernel
min/max stats (with_stats) + the analytic dB-extrema tail
(core.scale.normalize_from_stats) recovered part of the r2 gap but not
the lead; recorded as a negative result. At tiled sizes
the tile re-streaming and linearly growing DFT FLOPs hand even the bare
stage to XLA's rFFT (4096: 0.35 pallas / 0.34 xla-matmul / 0.19 xla-fft;
8192: 0.58 / 0.68 / 0.31). The production default is therefore the XLA
matmul path everywhere; the kernel is an opt-in for bare-STFT workloads
at nperseg <= 1024 and the reference demonstration of the fused-framing
technique.
Above nperseg 4096 the Mosaic pipeline's double-buffered A tiles exceed
VMEM, so the kernel switches to manual DMA: A stays in HBM and one
single-buffered scratch tile reloads only on frequency-tile changes —
the GUI range up to 8192 (GUI.py:87-90) is covered. The DFT matrices
are generated on device above 8 MB so multi-hundred-MB constants never
embed in executables (core.stft.dft_matrices_device).

Constraints (see pallas_supported): nfft == nperseg, nperseg <= 8192,
gcd(nperseg, hop) >= 8 (so nperseg=32 at the scipy hop 28 — g=4 — falls
back to jnp), uncentered PSD mode without mel; the jnp path covers
zero-padded nfft and the exotic modes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.stft import (dft_matrices, dft_matrices_device,
                                    ensure_real_waveform, num_frames,
                                    onesided_weights, use_device_dft)

Array = jax.Array

LANE = 128
MAX_NPERSEG_VMEM = 8192  # GUI ceiling (GUI.py:87-90); manual DMA above 4096
# per-step budget for the two A tiles combined (double-buffered by the
# Mosaic pipeline when the tile index changes): 2 * nperseg * FT * 4 bytes
# per buffer set, kept ~<= 6 MB so rows/out/accumulators fit comfortably
_A_TILE_BUDGET = 6 * 2 ** 20
# when even one double-buffered tile pair exceeds this, switch to the
# manual-DMA kernel: A stays in HBM and ONE single-buffered VMEM scratch
# tile reloads only when the frequency-tile index changes
_A_AUTO_LIMIT = 12 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gcd_dims(cfg: SpecConfig):
    """(g, S, P): row width, row stride between frame starts, pieces per
    frame of the gcd framing (see module docstring). Dividing hops give
    (hop, 1, nperseg//hop) — the original kernel layout."""
    g = math.gcd(cfg.nperseg, cfg.hop_)
    return g, cfg.hop_ // g, cfg.nperseg // g


def _freq_tile(nperseg: int, f_padded: int) -> int:
    """Lane-aligned frequency tile width: the whole (padded) axis when the
    matrices fit the budget, else the largest lane multiple that does."""
    ft = _A_TILE_BUDGET // (2 * 4 * nperseg)
    ft = max(LANE, (ft // LANE) * LANE)
    return min(f_padded, ft)


def _freq_dims(cfg: SpecConfig):
    """(F, Fp, FT): real bins, padded width (multiple of the tile), tile."""
    F = cfg.n_freqs
    Fp = _round_up(F, LANE)
    ft = _freq_tile(cfg.nperseg, Fp)
    return F, _round_up(Fp, ft), ft


@functools.lru_cache(maxsize=16)
def _padded_consts(cfg: SpecConfig, fs: float):
    """(A_re, A_im, weights, FT), host numpy, frequency axis padded to a
    multiple of the tile width. Window + constant detrend are folded into
    the matrices (core.stft.dft_matrices). Only used when the matrices are
    small enough to embed as program constants (core.stft.use_device_dft)."""
    a_re, a_im = dft_matrices(cfg)   # (nperseg, F) float64
    wts = onesided_weights(cfg, fs)  # (F,)
    F, Fp, ft = _freq_dims(cfg)
    g, _S, P = _gcd_dims(cfg)
    pad = ((0, 0), (0, Fp - F))
    # reshape to per-g-piece stacks: frames @ A == sum_k piece_k @ A[k]
    a_re = np.pad(a_re, pad).astype(np.float32).reshape(P, g, Fp)
    a_im = np.pad(a_im, pad).astype(np.float32).reshape(P, g, Fp)
    return a_re, a_im, np.pad(wts, (0, Fp - F)).astype(np.float32), ft


def _dft_operands(cfg: SpecConfig, fs: float):
    """(a_re, a_im, wts, FT) as pallas_call operands: host constants for
    small configs; device-generated traced arrays for large ones so 100s of
    MB never embed in the compiled program (core.stft.dft_matrices_device,
    exact-int phase reduction)."""
    if not use_device_dft(cfg):
        a_re, a_im, wts, ft = _padded_consts(cfg, fs)
        return (jnp.asarray(a_re), jnp.asarray(a_im), jnp.asarray(wts), ft)
    F, Fp, ft = _freq_dims(cfg)
    g, _S, P = _gcd_dims(cfg)
    ar, ai = dft_matrices_device(cfg)
    pad = ((0, 0), (0, Fp - F))
    ar = jnp.pad(ar, pad).reshape(P, g, Fp)
    ai = jnp.pad(ai, pad).reshape(P, g, Fp)
    wts = np.pad(onesided_weights(cfg, fs),
                 (0, Fp - F)).astype(np.float32)
    return ar, ai, jnp.asarray(wts), ft


def _bf_vmem_cap(cfg: SpecConfig) -> int:
    """Largest frame-block size (multiple of 8) the on-chip scoped-VMEM
    budget affords for this config, per the measured cost model of the
    S>1 shave in stft_psd_pallas (~10 block-equivalents of (BF, S_pad, g)
    row temporaries next to the A tiles). The kernel's dual-read overlap
    requires BF >= q_max = (P-1)//S, so configs whose q_max exceeds this
    cap cannot run on chip at all — pallas_supported rejects them."""
    g, S, P = _gcd_dims(cfg)
    FT = _freq_dims(cfg)[2]
    a_vmem = 2 * 4 * cfg.nperseg * FT
    manual_a = 2 * a_vmem > _A_AUTO_LIMIT
    s_pad = _round_up(S, 8) if S > 1 else 1
    per_bf = 10 * s_pad * max(g, LANE) * 4
    avail = 14 * 2 ** 20 - (a_vmem if manual_a
                            else min(2 * a_vmem, _A_TILE_BUDGET))
    return max(8, avail // per_bf // 8 * 8)


def pallas_supported(cfg: SpecConfig) -> bool:
    """Non-dividing hops — including the reference's scipy default,
    PlotEngine.py:113 — are supported through the gcd framing; required:
    nfft == nperseg, the GUI nperseg ceiling, gcd(nperseg, hop) >= 8
    (smaller row widths waste >16x of every VMEM lane; the GUI's scipy
    range nperseg >= 64 always satisfies it, and the jnp path covers the
    rest), and a frame overlap that fits the VMEM frame-block budget
    (q_max <= _bf_vmem_cap: rules out tiny hops at huge nperseg, e.g.
    8192/24, where the forced overlap block alone would blow VMEM).

    Also requires the semantics the kernel actually implements — PSD mode,
    no center padding, no mel stage, no fmin/fmax band mask: the kernel
    computes uncentered full-band PSD only, and every caller
    (parallel/pipeline.py gates its Pallas path on THIS predicate) falls
    back to the XLA path for those configs instead of silently getting
    wrong frame timing / |X|^2 instead of |X| / a missing mel projection /
    a full-band image where the reference masks rows before normalizing
    (PlotEngine.py:114-127)."""
    g, S, P = _gcd_dims(cfg)
    q_max = (P - 1) // S
    return (cfg.nfft_ == cfg.nperseg
            and cfg.nperseg <= MAX_NPERSEG_VMEM
            and g >= 8
            and q_max <= _bf_vmem_cap(cfg)
            and cfg.mode == "psd"
            and not cfg.center
            and cfg.n_mels is None
            and cfg.fmin is None
            and cfg.fmax is None)


def stft_psd_pallas(x: Array, fs: float, cfg: SpecConfig,
                    block_frames: int = 128,
                    log10_out: bool = False,
                    interpret: Optional[bool] = None,
                    with_stats: bool = False):
    """Fused PSD spectrogram: (n,) or (B, n) -> (B?, T, F) float32.

    Matches core.stft.power_spectrogram (and scipy) for supported configs.
    interpret=None auto-selects interpreter mode off-TPU (tests).

    with_stats=True additionally reduces each image's min/max PSD inside
    the kernel (masked over valid frames/bins) and returns
    (psd, pmin, pmax) with pmin/pmax of shape (B?,) — feeding
    core.scale.normalize_from_stats, which turns the display tail into a
    single fused elementwise pass (no separate reduction read of the PSD).
    Incompatible with log10_out (stats are over linear PSD).
    """
    if x.ndim == 1:
        out = stft_psd_pallas(x[None], fs, cfg, block_frames, log10_out,
                              interpret, with_stats)
        return (out[0][0], out[1][0], out[2][0]) if with_stats else out[0]
    if with_stats and log10_out:
        raise ValueError("with_stats computes linear-PSD extrema; "
                         "combine with log10_out is unsupported")
    if not pallas_supported(cfg):
        raise ValueError(
            "config unsupported by the pallas kernel (requires: "
            f"nfft == nperseg, nperseg <= {MAX_NPERSEG_VMEM}, "
            "gcd(nperseg, hop) >= 8, the frame overlap within the VMEM "
            "budget, mode='psd', center=False, no mel); "
            "use core.stft.power_spectrogram")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # same coercion rule as the core engines: int/bool/half promote to
    # f32 before the windowed DFT, complex refuses, array-likes accepted
    x = ensure_real_waveform(x)
    nperseg, hop = cfg.nperseg, cfg.hop_
    g, S, P = _gcd_dims(cfg)
    # frames in a block extend at most q_max frame-rows past it (gcd
    # framing: piece k = q*S + s of frame i reads row group i + q)
    q_max = (P - 1) // S

    B, n = x.shape
    T = num_frames(n, nperseg, hop)
    if T <= 0:
        empty = jnp.zeros((B, 0, cfg.n_freqs), jnp.float32)
        if with_stats:
            return empty, jnp.zeros(B), jnp.zeros(B)
        return empty

    a_re, a_im, wts, FT = _dft_operands(cfg, fs)
    Fp = a_re.shape[2]
    nF = Fp // FT
    F = cfg.n_freqs

    a_vmem = 2 * 4 * nperseg * FT     # the A_re/A_im pair, one buffer set
    manual_a = (not interpret) and 2 * a_vmem > _A_AUTO_LIMIT
    BF = min(block_frames, _round_up(T, 8))
    bf_cap = _bf_vmem_cap(cfg)
    if S > 1:
        # VMEM budget for the frame blocks: a (BF, S, g) row block occupies
        # BF * S_pad * max(g, LANE) f32 lanes; the pipeline holds 2 dual
        # reads x 2 buffers plus the in-kernel concat/slice temporaries
        # (~10 block-equivalents measured at 8192-scipy: 18.9 MB scoped at
        # BF=32). Shave BF so everything beside the A tiles fits the ~16 MB
        # scoped VMEM limit with ~2 MB slack (_bf_vmem_cap).
        BF = min(BF, bf_cap)
    if q_max > BF:  # overlap must fit in the second row block
        BF = _round_up(q_max, 8)
        if BF > bf_cap and not interpret:
            # unreachable through pallas_supported (it checks q_max
            # against the same cap); guard direct callers
            raise ValueError(
                f"hop {hop} too small for nperseg {nperseg}: the forced "
                f"overlap block ({BF} frames) exceeds the VMEM budget "
                f"({bf_cap}); use core.stft.power_spectrogram")
    n_blocks = -(-T // BF)
    Tp = n_blocks * BF

    # row groups of S rows x g samples (= hop samples per frame slot);
    # (n_blocks + 1) blocks of BF groups so the dual read's j+1 block
    # always exists. Dividing hops (S == 1) keep the original 3D layout —
    # the unit S dim costs a measured ~9% in relayouts.
    groups_padded = (n_blocks + 1) * BF
    total = groups_padded * hop
    xp = jnp.pad(x, ((0, 0), (0, total - n))) if total > n else x[:, :total]
    rows = xp.reshape(B, groups_padded, g) if S == 1 \
        else xp.reshape(B, groups_padded, S, g)

    # Above _A_AUTO_LIMIT the Mosaic pipeline's double-buffered A tiles no
    # longer fit VMEM (measured compile failure at nperseg=8192): switch to
    # manual DMA — A stays in HBM (memory_space=ANY, pre-tiled (nF, r, hop,
    # FT) so each tile is one contiguous copy) and ONE single-buffered VMEM
    # scratch pair reloads only when the frequency tile changes (grid order
    # (j, f, b) makes that once per B inner steps). The interpreter has no
    # VMEM limit and no DMA primitives, so it always runs the auto kernel
    # (identical math); the manual path is chip-validated.
    def _compute(rows_a, rows_b, are_v, aim_v, wts_ref, out_ref,
                 omin_ref=None, omax_ref=None):
        # frame i of this block = row groups [i : i + P/S) flattened;
        # instead of materializing frames (Mosaic rejects the offset
        # concat), decompose the DFT matmul over g-wide pieces and
        # accumulate on the MXU: with piece k = q*S + s,
        #   frames @ A == sum_k rows[q : q + BF, s] @ A[k*g : (k+1)*g]
        rows2 = jnp.concatenate([rows_a[...], rows_b[...]], axis=0)
        # rows2: (2BF, g) when S == 1, else (2BF, S, g)
        xr = jnp.zeros((BF, FT), jnp.float32)
        xi = jnp.zeros((BF, FT), jnp.float32)
        # NOTE: precision must be explicit — a bare f32 jnp.dot lowers to a
        # single-pass bf16 MXU matmul under Mosaic (measured 18 dB error);
        # HIGHEST selects the multi-pass f32 path (2.7e-4 dB vs scipy) and
        # still runs at ~0.07 ms/clip. Mosaic supports only DEFAULT/HIGHEST
        # (DotAlgorithmPreset raises TypeError, chip-verified), so the
        # kernel runs cfg.precision='fast' at HIGHEST too rather than at
        # the useless single-pass tier; the XLA paths provide the real
        # 'fast' (bf16 3-pass) tier.
        prec = jax.lax.Precision.HIGHEST
        for k in range(P):
            q, s = divmod(k, S)
            if S == 1:
                piece = jax.lax.slice(rows2, (q, 0), (q + BF, g))
            else:
                piece = jax.lax.slice(rows2, (q, s, 0),
                                      (q + BF, s + 1, g)).reshape(BF, g)
            xr = xr + jnp.dot(piece, are_v[k], precision=prec,
                              preferred_element_type=jnp.float32)
            xi = xi + jnp.dot(piece, aim_v[k], precision=prec,
                              preferred_element_type=jnp.float32)
        p = (xr * xr + xi * xi) * wts_ref[:, :]
        if log10_out:
            p = jnp.log10(p + 1e-20)
        out_ref[:, :] = p
        if with_stats:
            # per-(frame-block, freq-tile) extrema over VALID frames only
            # (rows >= T are zero-padding artifacts); padded freq columns
            # are excluded later by the [:F] slice of the partials. The
            # one-row result broadcasts to the 8-sublane block Mosaic
            # requires — the duplicates are harmless to the host min/max.
            fid = (jax.lax.broadcasted_iota(jnp.int32, (BF, FT), 0)
                   + pl.program_id(0) * BF)
            valid = fid < T
            mn = jnp.min(jnp.where(valid, p, jnp.inf), axis=0)
            mx = jnp.max(jnp.where(valid, p, -jnp.inf), axis=0)
            omin_ref[:, :] = jnp.broadcast_to(mn[None, :], (8, FT))
            omax_ref[:, :] = jnp.broadcast_to(mx[None, :], (8, FT))

    def kernel_auto(rows_a, rows_b, are_ref, aim_ref, wts_ref, out_ref,
                    *rest):
        _compute(rows_a, rows_b, are_ref, aim_ref, wts_ref, out_ref, *rest)

    def kernel_manual(rows_a, rows_b, are_hbm, aim_hbm, wts_ref, out_ref,
                      *rest):
        *stats_refs, are_v, aim_v, sem = rest

        @pl.when(pl.program_id(2) == 0)   # first clip of this (j, f) pair
        def _load_tile():
            f = pl.program_id(1)
            cre = pltpu.make_async_copy(are_hbm.at[f], are_v, sem.at[0])
            cim = pltpu.make_async_copy(aim_hbm.at[f], aim_v, sem.at[1])
            cre.start()
            cim.start()
            cre.wait()
            cim.wait()
        _compute(rows_a, rows_b, are_v, aim_v, wts_ref, out_ref,
                 *stats_refs)

    if S == 1:
        rows_spec_a = pl.BlockSpec((None, BF, g), lambda j, f, b: (b, j, 0),
                                   memory_space=pltpu.VMEM)
        rows_spec_b = pl.BlockSpec((None, BF, g),
                                   lambda j, f, b: (b, j + 1, 0),
                                   memory_space=pltpu.VMEM)
    else:
        rows_spec_a = pl.BlockSpec((None, BF, S, g),
                                   lambda j, f, b: (b, j, 0, 0),
                                   memory_space=pltpu.VMEM)
        rows_spec_b = pl.BlockSpec((None, BF, S, g),
                                   lambda j, f, b: (b, j + 1, 0, 0),
                                   memory_space=pltpu.VMEM)
    wts_spec = pl.BlockSpec((1, FT), lambda j, f, b: (0, f),
                            memory_space=pltpu.VMEM)
    if manual_a:
        kernel = kernel_manual
        a_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)]
        a_re_op = a_re.reshape(P, g, nF, FT).transpose(2, 0, 1, 3)
        a_im_op = a_im.reshape(P, g, nF, FT).transpose(2, 0, 1, 3)
        scratch = [pltpu.VMEM((P, g, FT), jnp.float32),
                   pltpu.VMEM((P, g, FT), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kernel = kernel_auto
        a_specs = [pl.BlockSpec((P, g, FT), lambda j, f, b: (0, 0, f),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((P, g, FT), lambda j, f, b: (0, 0, f),
                                memory_space=pltpu.VMEM)]
        a_re_op, a_im_op = a_re, a_im
        scratch = []

    out_specs = [pl.BlockSpec((None, BF, FT), lambda j, f, b: (b, j, f),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((B, Tp, Fp), jnp.float32)]
    if with_stats:
        stat_spec = pl.BlockSpec((None, 8, FT), lambda j, f, b: (b, j, f),
                                 memory_space=pltpu.VMEM)
        stat_shape = jax.ShapeDtypeStruct((B, 8 * n_blocks, Fp),
                                          jnp.float32)
        out_specs += [stat_spec, stat_spec]
        out_shapes += [stat_shape, stat_shape]

    # Grid order (j, f, b): the batch dim is innermost so the A tile (the
    # big operand, changing only with f) stays VMEM-resident across all
    # clips while the per-clip signal rows stream; for nF == 1 (nperseg <=
    # 1024) this reduces to the untiled kernel with A resident everywhere.
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, nF, B),
        in_specs=[rows_spec_a, rows_spec_b, *a_specs, wts_spec],
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shapes if with_stats else out_shapes[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Tp * nperseg * Fp,
            bytes_accessed=(nF * B * total * 4 * 2 + 2 * nperseg * Fp * 4
                            + B * Tp * Fp * 4),
            transcendentals=B * Tp * Fp if log10_out else 0,
        ),
        interpret=interpret,
    )(rows, rows, a_re_op, a_im_op, wts[None, :])
    if with_stats:
        psd, omin, omax = out
        pmin = jnp.min(omin[:, :, :F], axis=(1, 2))
        pmax = jnp.max(omax[:, :, :F], axis=(1, 2))
        return psd[:, :T, :F], pmin, pmax
    return out[:, :T, :F]


def pallas_pipeline_fn(fs: float, cfg: SpecConfig, *,
                       colormap: Optional[str] = "jet",
                       block_frames: int = 128,
                       interpret: Optional[bool] = None):
    """Full display pipeline with the Pallas kernel as the STFT stage:
    (B, n) -> {psd, image, rgb_packed?}, output-compatible with
    parallel.sharding.batched_spectrogram_fn.

    The per-image PSD extrema reduce INSIDE the kernel (with_stats), so the
    display tail is one fused elementwise map (normalize_from_stats) into
    the colormap pack — no separate reduction pass re-reading the PSD."""
    from spectral_tpu.core.scale import normalize_from_stats
    from spectral_tpu.ops.colormap import apply_colormap_packed

    def fn(xb: Array):
        psd, pmin, pmax = stft_psd_pallas(xb, fs, cfg, block_frames,
                                          interpret=interpret,
                                          with_stats=True)
        img = jax.vmap(
            lambda s, lo, hi: normalize_from_stats(s, lo, hi,
                                                   cfg.log_scale)
        )(jnp.swapaxes(psd, -1, -2), pmin, pmax)
        out = {"psd": psd, "image": img}
        # free per-clip health flag: the in-kernel extrema already reduced
        # the PSD (inf overflows and NaN samples both poison pmax). Total
        # f32 UNDERFLOW (pmax == 0 from a tiny-but-real detrended clip)
        # also trips it — same contract as the XLA path's flag
        # (parallel/sharding.py) — so a blank PNG is never written where
        # the reference's f64 draws a real image; exact silence/DC
        # (detrended amplitude 0) stays healthy.
        adet = jnp.max(jnp.abs(xb - jnp.mean(xb, axis=-1, keepdims=True)),
                       axis=-1)
        underflow = (pmax == 0) & (adet > 0) & (adet < 1e-10)
        out["finite"] = jnp.isfinite(pmin) & jnp.isfinite(pmax) & ~underflow
        if colormap:
            out["rgb_packed"] = apply_colormap_packed(img, colormap,
                                                      flip_rows=True)
        return out

    return fn


# ---------------------------------------------------------------------------
# NOTE: a fully-fused single-launch display kernel (STFT -> PSD -> normalize
# -> dB -> colormap -> packed RGBA in one VMEM pass per clip) existed through
# round 1 and was DELETED deliberately: per-image normalization needs the
# image-global max, forcing a one-block-per-clip grid that cannot pipeline
# across frame blocks, and it measured *slower* than the staged path on v5e
# (0.100 ms/clip vs 0.085 for pallas-STFT + XLA-fused elementwise tail,
# BENCH_REPORT r1). The staged pipeline already gives XLA a two-pass
# max/rescale it fuses optimally; a hand-fused kernel is structurally unable
# to beat it here. pallas_pipeline_fn below IS the production fused path.
# ---------------------------------------------------------------------------
