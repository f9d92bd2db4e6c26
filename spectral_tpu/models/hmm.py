"""Diagonal-covariance Gaussian HMM in JAX.

TPU-native replacement for the reference's hmmlearn dependency
(``hmm.GaussianHMM(n_components=4, covariance_type="diag", n_iter=100,
random_state=42)``, PlotEngine.py:20; 2-state variant at :392). Everything is
log-space, built on ``lax.scan`` / ``lax.while_loop`` so fitting and decoding
jit-compile to single XLA programs and ``vmap`` over batches of sequences.

Algorithmic conventions mirror hmmlearn's documented Baum-Welch variant so the
detection behavior matches the reference:

  * init: uniform startprob/transmat; means from k-means (deterministic,
    seeded); covariances = global diagonal variance + min_covar;
  * M-step regularization: covars_prior added to the covariance numerator
    (hmmlearn default 1e-2 for 'diag'), min_covar floor 1e-3;
  * convergence: stop when the log-likelihood gain drops below tol (1e-2).

Closed-form supervised fitting and the transition-matrix "escape route" patch
reproduce PlotEngine._train_supervised (:328-387) and unsupervised_detect's
transmat surgery (:423-437) exactly — see :mod:`spectral_tpu.models.detector`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

Array = jax.Array

MIN_COVAR = 1e-3      # hmmlearn GaussianHMM default min_covar
COVARS_PRIOR = 1e-2   # hmmlearn default covars_prior for 'diag'
DEFAULT_TOL = 1e-2    # hmmlearn default convergence tolerance
_LOG_EPS = -1e10      # effective log(0)


class HMMParams(NamedTuple):
    """Pytree of HMM parameters (K states, D feature dims)."""
    startprob: Array  # (K,)
    transmat: Array   # (K, K)
    means: Array      # (K, D)
    covars: Array     # (K, D) diagonal variances


# ---------------------------------------------------------------------------
# Emission / forward / backward / viterbi
# ---------------------------------------------------------------------------

def log_emission(params: HMMParams, X: Array) -> Array:
    """Framewise diagonal-Gaussian log-likelihood: (T, D) -> (T, K)."""
    v = jnp.maximum(params.covars, 1e-12)
    diff = X[:, None, :] - params.means[None, :, :]           # (T, K, D)
    return -0.5 * jnp.sum(diff * diff / v + jnp.log(2.0 * jnp.pi * v), axis=-1)


def _safe_log(p: Array) -> Array:
    return jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-300)), _LOG_EPS)


def forward_log(params: HMMParams, log_b: Array) -> Tuple[Array, Array]:
    """Log-space forward pass. Returns (log_alpha (T,K), loglik)."""
    log_start = _safe_log(params.startprob)
    log_trans = _safe_log(params.transmat)

    a0 = log_start + log_b[0]

    def step(prev, lb):
        nxt = lb + logsumexp(prev[:, None] + log_trans, axis=0)
        return nxt, nxt

    last, rest = jax.lax.scan(step, a0, log_b[1:])
    log_alpha = jnp.concatenate([a0[None], rest], axis=0)
    return log_alpha, logsumexp(last)


def backward_log(params: HMMParams, log_b: Array) -> Array:
    """Log-space backward pass. Returns log_beta (T, K)."""
    log_trans = _safe_log(params.transmat)
    bT = jnp.zeros_like(log_b[0])

    def step(nxt, lb_next):
        cur = logsumexp(log_trans + (lb_next + nxt)[None, :], axis=1)
        return cur, cur

    _, rest = jax.lax.scan(step, bT, log_b[1:], reverse=True)
    return jnp.concatenate([rest, bT[None]], axis=0)


def viterbi(params: HMMParams, X: Array) -> Array:
    """Most-likely state sequence (hmmlearn .predict): (T, D) -> (T,) int32."""
    log_b = log_emission(params, X)
    log_start = _safe_log(params.startprob)
    log_trans = _safe_log(params.transmat)

    d0 = log_start + log_b[0]

    def fwd(prev, lb):
        scores = prev[:, None] + log_trans            # (K from, K to)
        best = jnp.max(scores, axis=0) + lb
        arg = jnp.argmax(scores, axis=0)
        return best, arg

    last, psi = jax.lax.scan(fwd, d0, log_b[1:])      # psi: (T-1, K)
    end = jnp.argmax(last)

    def back(state, a):
        prev = a[state]
        return prev, prev

    _, states_rev = jax.lax.scan(back, end, psi, reverse=True)
    return jnp.concatenate([states_rev, end[None]]).astype(jnp.int32)


def score(params: HMMParams, X: Array) -> Array:
    """Sequence log-likelihood under the model."""
    return forward_log(params, log_emission(params, X))[1]


# ---------------------------------------------------------------------------
# EM (Baum-Welch)
# ---------------------------------------------------------------------------

def _e_step(params: HMMParams, X: Array):
    log_b = log_emission(params, X)
    log_alpha, ll = forward_log(params, log_b)
    log_beta = backward_log(params, log_b)
    log_gamma = log_alpha + log_beta - ll
    gamma = jnp.exp(log_gamma)                        # (T, K)
    log_trans = _safe_log(params.transmat)
    # xi[t, i, j] ∝ alpha[t,i] + trans[i,j] + b[t+1,j] + beta[t+1,j]
    xi_log = (log_alpha[:-1, :, None] + log_trans[None]
              + (log_b[1:] + log_beta[1:])[:, None, :] - ll)
    xi_sum = jnp.sum(jnp.exp(xi_log), axis=0)         # (K, K)
    return gamma, xi_sum, ll


def _m_step(params: HMMParams, X: Array, gamma: Array, xi_sum: Array,
            covars_prior: float = COVARS_PRIOR,
            min_covar: float = MIN_COVAR) -> HMMParams:
    start_new = gamma[0] / jnp.maximum(jnp.sum(gamma[0]), 1e-30)

    row = jnp.sum(xi_sum, axis=1, keepdims=True)
    trans_new = jnp.where(row > 0, xi_sum / jnp.maximum(row, 1e-30),
                          params.transmat)

    denom = jnp.sum(gamma, axis=0)                    # (K,)
    obs = gamma.T @ X                                 # (K, D)
    obs2 = gamma.T @ (X * X)                          # (K, D)
    d = jnp.maximum(denom, 1e-30)[:, None]
    means_new = jnp.where(denom[:, None] > 0, obs / d, params.means)
    # E[(x-m)^2] numerator with the hmmlearn-style prior
    num = obs2 - 2.0 * means_new * obs + means_new * means_new * denom[:, None]
    covars_new = (covars_prior + num) / jnp.maximum(denom[:, None], 1e-5)
    covars_new = jnp.maximum(covars_new, min_covar)
    return HMMParams(start_new, trans_new, means_new, covars_new)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def fit(params0: HMMParams, X: Array, n_iter: int = 100,
        tol: float = DEFAULT_TOL) -> Tuple[HMMParams, Array, Array]:
    """Baum-Welch EM, fully jitted (lax.while_loop). vmap over a batch by
    vmapping this function over (params0, X).

    Returns (params, final_loglik, n_iterations_run).
    """
    def cond(carry):
        params, prev_ll, ll, it = carry
        return jnp.logical_and(it < n_iter,
                               jnp.logical_or(it == 0, ll - prev_ll > tol))

    def body(carry):
        params, prev_ll, ll, it = carry
        gamma, xi_sum, cur_ll = _e_step(params, X)
        new_params = _m_step(params, X, gamma, xi_sum)
        return (new_params, ll, cur_ll, it + 1)

    init = (params0, -jnp.inf, -jnp.inf, jnp.asarray(0))
    params, _, ll, it = jax.lax.while_loop(cond, body, init)
    return params, ll, it


# ---------------------------------------------------------------------------
# Initialization (host-side, deterministic)
# ---------------------------------------------------------------------------

def _kmeans_pp(X: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    n = X.shape[0]
    centers = [X[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(((X[:, None, :] - np.asarray(centers)[None]) ** 2
                     ).sum(-1), axis=1)
        s = d2.sum()
        if s <= 0:
            centers.append(X[rng.randint(n)])
            continue
        probs = d2 / s
        centers.append(X[rng.choice(n, p=probs)])
    return np.asarray(centers)


def kmeans(X: np.ndarray, k: int, seed: int = 42, n_init: int = 10,
           max_iter: int = 300) -> np.ndarray:
    """Deterministic Lloyd k-means with k-means++ seeding (numpy, host-side).

    Stands in for hmmlearn's sklearn-KMeans means initialization
    (random_state=42 in the reference, PlotEngine.py:20,392).
    """
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.RandomState(seed)
    best_c, best_inertia = None, np.inf
    for _ in range(n_init):
        centers = _kmeans_pp(X, k, rng)
        for _ in range(max_iter):
            d2 = ((X[:, None, :] - centers[None]) ** 2).sum(-1)
            assign = d2.argmin(1)
            new_centers = np.array([
                X[assign == j].mean(0) if np.any(assign == j) else centers[j]
                for j in range(k)])
            if np.allclose(new_centers, centers):
                centers = new_centers
                break
            centers = new_centers
        inertia = (((X - centers[assign]) ** 2).sum(-1)).sum()
        if inertia < best_inertia:
            best_inertia, best_c = inertia, centers
    return best_c


def init_params(X, k: int, seed: int = 42, min_covar: float = MIN_COVAR,
                dtype=jnp.float32) -> HMMParams:
    """hmmlearn-style init: uniform start/trans, k-means means, pooled
    diagonal covariance + min_covar."""
    Xh = np.asarray(X, dtype=np.float64)
    means = kmeans(Xh, k, seed=seed)
    var = Xh.var(axis=0) + min_covar
    return HMMParams(
        startprob=jnp.full((k,), 1.0 / k, dtype),
        transmat=jnp.full((k, k), 1.0 / k, dtype),
        means=jnp.asarray(means, dtype),
        covars=jnp.asarray(np.tile(var, (k, 1)), dtype),
    )


# ---------------------------------------------------------------------------
# Closed-form supervised fit (PlotEngine._train_supervised, :328-387)
# ---------------------------------------------------------------------------

def supervised_fit(features, labels, n_states: int,
                   dtype=jnp.float32) -> HMMParams:
    """Exact reproduction of the reference's closed-form supervised fit.

    Per state: >1 samples -> (mean, var + 1e-6); ==1 sample -> (x, 1e-6);
    ==0 samples -> (0, 1e-6). Transition counts row-normalized; rows with no
    outgoing transitions get self-probability 1; if n_states > 3 row 3 is
    forced to a deterministic 3 -> 0 transition; startprob = [1, 0, 0, ...].
    """
    X = np.asarray(features, dtype=np.float64)
    labels = np.asarray(labels)
    D = X.shape[1]
    means, covars = [], []
    for i in range(n_states):
        sf = X[labels == i]
        if sf.shape[0] > 1:
            means.append(sf.mean(axis=0))
            covars.append(sf.var(axis=0) + 1e-6)
        elif sf.shape[0] == 1:
            means.append(sf[0])
            covars.append(np.ones(D) * 1e-6)
        else:
            means.append(np.zeros(D))
            covars.append(np.ones(D) * 1e-6)

    transmat = np.zeros((n_states, n_states))
    for i in range(len(labels) - 1):
        transmat[labels[i], labels[i + 1]] += 1
    row_sums = transmat.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore"):
        transmat_prob = np.divide(transmat, row_sums,
                                  out=np.zeros_like(transmat),
                                  where=row_sums != 0)
    for s in np.where(row_sums.flatten() == 0)[0]:
        transmat_prob[s, s] = 1.0
    if n_states > 3:
        transmat_prob[3, :] = 0.0
        transmat_prob[3, 0] = 1.0

    startprob = np.zeros(n_states)
    startprob[0] = 1.0
    return HMMParams(jnp.asarray(startprob, dtype),
                     jnp.asarray(transmat_prob, dtype),
                     jnp.asarray(np.asarray(means), dtype),
                     jnp.asarray(np.asarray(covars), dtype))


# ---------------------------------------------------------------------------
# Unsupervised transmat "escape route" patch (PlotEngine.py:423-437)
# ---------------------------------------------------------------------------

def patch_escape_routes(transmat, baseline_state: int) -> np.ndarray:
    """For every non-baseline state with < 1e-5 probability of reaching the
    baseline and self-transition > 0.1, donate min(5% of self, 0.05) to the
    baseline transition."""
    tm = np.array(transmat, dtype=np.float64, copy=True)
    k = tm.shape[0]
    for i in range(k):
        if i == baseline_state:
            continue
        if tm[i, baseline_state] < 1e-5 and tm[i, i] > 0.1:
            donation = min(tm[i, i] * 0.05, 0.05)
            tm[i, i] -= donation
            tm[i, baseline_state] += donation
    return tm
