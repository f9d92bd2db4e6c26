"""Behavioral parity vs hmmlearn (the reference's detector IS hmmlearn:
PlotEngine.py:9,20,392).

hmmlearn is not installable in this image, so parity is proven in two
independent layers:

1. ``models/kmeans.py`` must equal ``sklearn.cluster.KMeans`` **bit-for-bit**
   — sklearn is the exact library hmmlearn calls to initialize GaussianHMM
   means (``cluster.KMeans(n_clusters, random_state, n_init=10)``), and it IS
   installed, so the init stage needs no trust at all.
2. A numpy oracle in this file reimplements hmmlearn's documented GaussianHMM
   algorithm (log-space forward/backward EM, the exact M-step priors and
   zero-pinning of ``_BaseHMM._do_mstep`` / ``GaussianHMM._do_mstep``,
   ConvergenceMonitor semantics, sklearn-KMeans init) in float64 and must
   match the JAX fit/viterbi and the full unsupervised detection flow.

sklearn, like scipy, is a TEST-ONLY oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spectral_tpu.core import events as ev
from spectral_tpu.models import hmm
from spectral_tpu.models.detector import BurstDetector
from spectral_tpu.models.kmeans import kmeans_fit


# ---------------------------------------------------------------------------
# Layer 1: sklearn-exact KMeans
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("trial", range(8))
def test_kmeans_bit_exact_vs_sklearn(trial):
    from sklearn.cluster import KMeans
    rng = np.random.RandomState(trial)
    n = int(rng.randint(40, 500))
    d = int(rng.randint(1, 5))
    k = int(rng.choice([2, 3, 4, 5]))
    X = rng.randn(n, d) * (1 + trial % 3)
    if trial % 2 == 0:
        X[: n // 3] += 4.0          # separated blobs
    sk = KMeans(n_clusters=k, random_state=42, n_init=10).fit(X)
    centers, labels, inertia = kmeans_fit(X, k, seed=42, n_init=10)
    np.testing.assert_allclose(centers, sk.cluster_centers_,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(labels, sk.labels_)
    assert abs(inertia - sk.inertia_) <= 1e-8 * max(1.0, sk.inertia_)


def test_kmeans_exact_on_detection_features():
    # the actual feature distribution the detector clusters:
    # [log10 band power, delta] (PlotEngine.py:239-242)
    from sklearn.cluster import KMeans
    feats = _synthetic_features(np.random.RandomState(0), T=500)
    for k in (2, 4):
        sk = KMeans(n_clusters=k, random_state=42, n_init=10).fit(
            feats.astype(np.float64))
        centers, labels, _ = kmeans_fit(feats, k, seed=42, n_init=10)
        np.testing.assert_allclose(centers, sk.cluster_centers_,
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_array_equal(labels, sk.labels_)


def test_kmeans_duplicate_points_relocation():
    # more clusters than distinct points exercises the empty-cluster
    # relocation path (_relocate_empty_clusters_dense)
    from sklearn.cluster import KMeans
    X = np.repeat(np.array([[0.0, 0.0], [1.0, 1.0], [5.0, 5.0]]), 7, axis=0)
    X += np.random.RandomState(3).randn(*X.shape) * 1e-3
    sk = KMeans(n_clusters=5, random_state=42, n_init=10).fit(X)
    centers, labels, _ = kmeans_fit(X, 5, seed=42, n_init=10)
    np.testing.assert_allclose(centers, sk.cluster_centers_,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(labels, sk.labels_)


# ---------------------------------------------------------------------------
# Layer 2: numpy hmmlearn oracle (float64)
# ---------------------------------------------------------------------------

class HmmlearnOracle:
    """hmmlearn.hmm.GaussianHMM(covariance_type='diag') reimplemented in
    numpy float64 from the published algorithm, init through the REAL
    sklearn KMeans (independent of models/kmeans.py)."""

    def __init__(self, n_components, n_iter=100, tol=1e-2, random_state=42,
                 min_covar=1e-3, covars_prior=1e-2):
        self.k = n_components
        self.n_iter = n_iter
        self.tol = tol
        self.random_state = random_state
        self.min_covar = min_covar
        self.covars_prior = covars_prior
        self.lls_ = []

    def _init(self, X):
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=self.k, random_state=self.random_state,
                    n_init=10).fit(X)
        self.means_ = km.cluster_centers_.astype(np.float64)
        cv = np.cov(X.T) + self.min_covar * np.eye(X.shape[1])
        cv = np.atleast_2d(cv)
        self.covars_ = np.tile(np.diag(cv), (self.k, 1))
        self.startprob_ = np.full(self.k, 1.0 / self.k)
        self.transmat_ = np.full((self.k, self.k), 1.0 / self.k)

    def _log_b(self, X):
        v = self.covars_
        diff = X[:, None, :] - self.means_[None]
        return -0.5 * np.sum(diff * diff / v + np.log(2 * np.pi * v), axis=-1)

    @staticmethod
    def _logsumexp(a, axis=None):
        m = np.max(a, axis=axis, keepdims=True)
        out = np.log(np.sum(np.exp(a - m), axis=axis)) + np.squeeze(m, axis)
        return out

    def _forward(self, log_b):
        T, K = log_b.shape
        la = np.zeros((T, K))
        lstart = np.log(np.where(self.startprob_ > 0, self.startprob_, 1e-300))
        lstart[self.startprob_ == 0] = -1e12
        ltr = np.where(self.transmat_ > 0, np.log(
            np.maximum(self.transmat_, 1e-300)), -1e12)
        la[0] = lstart + log_b[0]
        for t in range(1, T):
            la[t] = log_b[t] + self._logsumexp(la[t - 1][:, None] + ltr,
                                               axis=0)
        return la, self._logsumexp(la[-1])

    def _backward(self, log_b):
        T, K = log_b.shape
        lb = np.zeros((T, K))
        ltr = np.where(self.transmat_ > 0, np.log(
            np.maximum(self.transmat_, 1e-300)), -1e12)
        for t in range(T - 2, -1, -1):
            lb[t] = self._logsumexp(ltr + (log_b[t + 1] + lb[t + 1])[None],
                                    axis=1)
        return lb

    def fit(self, X):
        X = np.asarray(X, np.float64)
        self._init(X)
        prev = None
        for _ in range(self.n_iter):
            log_b = self._log_b(X)
            la, ll = self._forward(log_b)
            lb = self._backward(log_b)
            gamma = np.exp(la + lb - ll)
            ltr = np.where(self.transmat_ > 0, np.log(
                np.maximum(self.transmat_, 1e-300)), -1e12)
            xi = np.exp(la[:-1, :, None] + ltr[None]
                        + (log_b[1:] + lb[1:])[:, None, :] - ll)
            xi_sum = xi.sum(axis=0)

            # _BaseHMM._do_mstep with priors 1.0: zero entries stay zero
            num_s = np.where(self.startprob_ == 0, 0.0, gamma[0])
            s = num_s.sum()
            self.startprob_ = num_s / (s if s else 1.0)
            num_t = np.where(self.transmat_ == 0, 0.0, xi_sum)
            r = num_t.sum(axis=1, keepdims=True)
            self.transmat_ = num_t / np.where(r == 0, 1.0, r)

            denom = gamma.sum(axis=0)[:, None]
            obs = gamma.T @ X
            obs2 = gamma.T @ (X * X)
            self.means_ = obs / denom
            cv_num = (obs2 - 2 * self.means_ * obs
                      + self.means_ ** 2 * denom)
            self.covars_ = (self.covars_prior + cv_num) / np.maximum(denom,
                                                                     1e-5)
            self.lls_.append(float(ll))
            if prev is not None and ll - prev < self.tol:
                break
            prev = ll
        return self

    def predict(self, X):
        X = np.asarray(X, np.float64)
        log_b = self._log_b(X)
        T, K = log_b.shape
        lstart = np.where(self.startprob_ > 0, np.log(
            np.maximum(self.startprob_, 1e-300)), -1e12)
        ltr = np.where(self.transmat_ > 0, np.log(
            np.maximum(self.transmat_, 1e-300)), -1e12)
        delta = lstart + log_b[0]
        psi = np.zeros((T - 1, K), np.int64)
        for t in range(1, T):
            scores = delta[:, None] + ltr
            psi[t - 1] = np.argmax(scores, axis=0)
            delta = np.max(scores, axis=0) + log_b[t]
        states = np.zeros(T, np.int64)
        states[-1] = np.argmax(delta)
        for t in range(T - 2, -1, -1):
            states[t] = psi[t, states[t + 1]]
        return states


def _synthetic_features(rng, T=400, burst_spans=((80, 130), (220, 300))):
    """EEG-like detection features: baseline log-power ~ -6, bursts ~ -3,
    plus the delta channel (PlotEngine.py:239-242 shape)."""
    logp = -6.0 + 0.15 * rng.randn(T)
    for a, b in burst_spans:
        logp[a:b] = -3.0 + 0.2 * rng.randn(b - a)
    delta = np.diff(logp, prepend=logp[0])
    return np.stack([logp, delta], axis=1).astype(np.float64)


def test_init_params_matches_hmmlearn_init():
    feats = _synthetic_features(np.random.RandomState(1))
    oracle = HmmlearnOracle(4)
    oracle._init(feats)
    # exact equality at the numpy (pre-device) stage ...
    np.testing.assert_allclose(hmm.kmeans(feats, 4, seed=42), oracle.means_,
                               rtol=1e-12, atol=1e-12)
    # ... and f32-cast equality once staged as HMMParams
    p = hmm.init_params(feats, 4, seed=42)
    np.testing.assert_allclose(np.asarray(p.means), oracle.means_,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.covars), oracle.covars_,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p.startprob), oracle.startprob_)
    np.testing.assert_allclose(np.asarray(p.transmat), oracle.transmat_)


@pytest.mark.parametrize("seed,k", [(0, 4), (1, 4), (2, 2)])
def test_em_matches_oracle(seed, k):
    feats = _synthetic_features(np.random.RandomState(seed))
    oracle = HmmlearnOracle(k, n_iter=100).fit(feats)

    X = jnp.asarray(feats, jnp.float32)
    p0 = hmm.init_params(feats, k, seed=42)
    params, ll, it = hmm.fit(p0, X, n_iter=100)

    # same convergence point (ll within f32 slack) and same model
    assert abs(float(ll) - oracle.lls_[-1]) < 5e-3 * abs(oracle.lls_[-1])
    np.testing.assert_allclose(np.asarray(params.means), oracle.means_,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(params.covars), oracle.covars_,
                               rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.transmat), oracle.transmat_,
                               rtol=2e-2, atol=2e-3)
    # identical decoded state sequences
    ours = np.asarray(hmm.viterbi(params, X))
    theirs = oracle.predict(feats)
    np.testing.assert_array_equal(ours, theirs)


def test_em_iteration_count_and_trajectory():
    # first EM iterations must track the oracle's log-likelihood trajectory
    feats = _synthetic_features(np.random.RandomState(4))
    oracle = HmmlearnOracle(4, n_iter=5, tol=-np.inf)
    oracle.fit(feats)
    p = hmm.init_params(feats, 4, seed=42)
    X = jnp.asarray(feats, jnp.float32)
    for i in range(5):
        p_next, ll, _ = hmm.fit(p, X, n_iter=1, tol=-jnp.inf)
        assert abs(float(ll) - oracle.lls_[i]) < 1e-3 * abs(oracle.lls_[i]), i
        p = p_next


def test_unsupervised_detect_events_match_oracle_flow():
    """Full flow parity: JAX BurstDetector vs oracle run through the same
    post-processing (escape-route patch, Viterbi, baseline scan, merge)
    — mirrors PlotEngine.unsupervised_detect (:411-473) end to end."""
    rng = np.random.RandomState(7)
    feats = _synthetic_features(rng, T=500,
                                burst_spans=((60, 110), (200, 260),
                                             (380, 450)))
    t = 0.5 + np.arange(500) * 0.128          # arbitrary frame-center grid

    det = BurstDetector()
    ours = det.unsupervised_detect(t, feats.astype(np.float32))

    oracle = HmmlearnOracle(4).fit(feats)
    baseline = int(np.argmin(oracle.means_[:, 0]))
    oracle.transmat_ = hmm.patch_escape_routes(oracle.transmat_, baseline)
    states = oracle.predict(feats)
    theirs = ev.merge_overlapping_events(
        ev.baseline_scan(states, t, baseline))

    assert len(ours) == len(theirs)
    for (a0, a1), (b0, b1) in zip(ours, theirs):
        assert a0 == pytest.approx(b0, abs=1e-9)
        assert a1 == pytest.approx(b1, abs=1e-9)


def test_roi_two_state_fit_matches_oracle():
    # the temp 2-state HMM of _find_burst_in_roi (PlotEngine.py:389-409)
    rng = np.random.RandomState(11)
    feats = _synthetic_features(rng, T=120, burst_spans=((40, 80),))
    oracle = HmmlearnOracle(2, n_iter=50).fit(feats)
    p0 = hmm.init_params(feats, 2, seed=42)
    params, _, _ = hmm.fit(p0, jnp.asarray(feats, jnp.float32), n_iter=50)
    np.testing.assert_array_equal(
        np.asarray(hmm.viterbi(params, jnp.asarray(feats, jnp.float32))),
        oracle.predict(feats))
    assert int(np.argmax(np.asarray(params.means)[:, 0])) == \
        int(np.argmax(oracle.means_[:, 0]))


@pytest.mark.parametrize("trial", range(8))
def test_kmeans_bit_exact_on_adversarial_data(trial):
    """Degenerate data classes where last-ulp arithmetic decides the
    result: near-duplicate points (3+ states collapse onto one cluster;
    x*(1/w) vs x/w flips labels) and collinear data (pairwise vs
    sequential inertia summation flips the strict best-run selection).
    Bit-exactness here is what makes the hmmlearn-parity chain hold on
    degenerate recordings, not just well-separated ones."""
    from sklearn.cluster import KMeans
    rng = np.random.RandomState(trial * 11 + 3)
    if trial % 2 == 0:
        # near-duplicates: k exceeds the number of distinct points
        base = rng.randn(4, 2)
        X = np.repeat(base, 15, axis=0) + 1e-9 * rng.randn(60, 2)
        k = 6
    else:
        # exactly collinear features
        tcol = rng.randn(50, 1)
        X = np.hstack([tcol, 2.0 * tcol])
        k = 3
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")   # sklearn's duplicate-point warning
        sk = KMeans(n_clusters=k, random_state=42, n_init=10).fit(X)
    centers, labels, inertia = kmeans_fit(X, k, seed=42, n_init=10)
    np.testing.assert_array_equal(centers, sk.cluster_centers_)
    np.testing.assert_array_equal(labels, sk.labels_)



def test_kmeans_parity_wide_features():
    """8+ features exercise sklearn's 4-wide distance accumulation (numpy's
    .sum(axis=1) switches summation order at >= 8 features) and the
    uncentered-tolerance call order."""
    from sklearn.cluster import KMeans
    from spectral_tpu.models.kmeans import kmeans_fit
    for seed in range(5):
        rng = np.random.RandomState(seed)
        X = np.round(rng.randn(200, 9) * 50.0 + 1000.0, 1)  # big mean: tol
        # centering matters
        centers, labels, inertia = kmeans_fit(X, 4, seed=seed)
        sk = KMeans(n_clusters=4, random_state=seed, n_init=10).fit(X)
        np.testing.assert_array_equal(centers, sk.cluster_centers_)
        np.testing.assert_array_equal(labels, sk.labels_)
        assert inertia == sk.inertia_
