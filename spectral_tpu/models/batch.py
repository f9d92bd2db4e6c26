"""Batched burst detection over many sweeps/clips.

The reference detects on one plotted signal at a time (PlotEngine.py:411).
Production fleets run the unsupervised flow over thousands of clips: the EM
fit and Viterbi decode are vmapped into single device launches (sharding the
batch over a mesh composes via parallel.sharding), with only the tiny
state-sequence -> interval scans left on host.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.core import events as ev
from spectral_tpu.models import hmm

Event = Tuple[float, float]

# persistent jit wrappers: a fresh jax.jit(lambda ...) per call would key
# the jit cache on the new lambda object and RETRACE every invocation —
# O(20 s-5 min) per call over a remote runtime (same rationale as
# models/detector.py::_viterbi_jit)
_fit_v = jax.jit(jax.vmap(
    lambda p, x, n: hmm.fit(p, x, n_iter=n)[0], in_axes=(0, 0, None)),
    static_argnums=2)
_viterbi_v = jax.jit(jax.vmap(hmm.viterbi))
_viterbi_shared = jax.jit(jax.vmap(hmm.viterbi, in_axes=(None, 0)))


def batch_unsupervised_detect(t: np.ndarray, feats: np.ndarray,
                              n_states: int = 4, n_iter: int = 100,
                              seed: int = 42) -> List[List[Event]]:
    """Run the full unsupervised flow per clip over a batch.

    t: (T,) shared frame times; feats: (B, T, D). Returns per-clip merged
    event lists. Mirrors PlotEngine.unsupervised_detect per clip: EM fit,
    escape-route transmat patch, Viterbi, baseline scan, merge.
    """
    feats = np.asarray(feats, np.float32)
    B, T, D = feats.shape
    if T < n_states:
        raise ValueError("Not enough data to train the model.")

    inits = [hmm.init_params(feats[b], n_states, seed=seed) for b in range(B)]
    params0 = jax.tree.map(lambda *a: jnp.stack(a), *inits)

    params = _fit_v(params0, jnp.asarray(feats), n_iter)

    # per-clip escape patch (host: K x K is tiny) then batched Viterbi
    means = np.asarray(params.means)            # (B, K, D)
    trans = np.asarray(params.transmat)
    baselines = np.argmin(means[:, :, 0], axis=1)
    patched = np.stack([hmm.patch_escape_routes(trans[b], int(baselines[b]))
                        for b in range(B)])
    params = params._replace(transmat=jnp.asarray(patched, jnp.float32))

    states = np.asarray(_viterbi_v(params, jnp.asarray(feats)))  # (B, T)

    out: List[List[Event]] = []
    for b in range(B):
        evs = ev.baseline_scan(states[b], t, int(baselines[b]))
        out.append(ev.merge_overlapping_events(evs))
    return out


def batch_viterbi_detect(params: hmm.HMMParams, t: np.ndarray,
                         feats: np.ndarray, scan: str = "label"
                         ) -> List[List[Event]]:
    """Decode a batch with one shared model.

    scan='label': the learn_and_detect semantics (states {1,2} open, 0
    closes) — appropriate for supervised-fit models, which generalize only
    to clips with closely matching onset statistics (the tight per-state
    variance floors are reference-faithful, PlotEngine.py:328-355).
    scan='baseline': the unsupervised semantics with baseline =
    argmin(mean log-power) — the robust choice for EM-fitted shared models.
    """
    states = np.asarray(_viterbi_shared(params,
                                        jnp.asarray(feats, jnp.float32)))
    if scan == "label":
        return [ev.merge_overlapping_events(ev.label_scan(states[b], t))
                for b in range(states.shape[0])]
    baseline = int(np.argmin(np.asarray(params.means)[:, 0]))
    return [ev.merge_overlapping_events(ev.baseline_scan(states[b], t, baseline))
            for b in range(states.shape[0])]
