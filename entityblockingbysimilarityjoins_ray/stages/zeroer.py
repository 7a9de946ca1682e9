"""ZeroER: unsupervised EM entity matcher (zero labeled examples).

Rebuilds the reference's vendored ZeroER model (reference
``matcher/zero_er/model.py:70-478`` / ``matcher/zero_er.py``, itself the
public chu-data-lab/zeroer SIGMOD'20 code) numpy-only — this container has
no scipy/sklearn, consistent with the repo's numpy CART forest:

- per-feature match (M) / unmatch (U) Gaussians seeded from a scaled-sum
  threshold init (``get_y_init_given_threshold``, model.py:21-28),
- EM over multivariate normals with ATTRIBUTE-GROUP block covariance
  (features sharing the leading ``attr_`` name segment get correlated
  off-diagonals, model.py:109-114, 399-409),
- adaptive Bhattacharyya-coefficient variance regularization: per-feature
  kappa solved by the same secant iteration ``scipy.optimize.newton(x0,x1)``
  performs (model.py:379-395), clipped to [0,1],
- free-energy convergence meter (10 offers, rate 0.01, model.py:441-464),
- optional transitivity enforcement for the self-join (``LR_identical``)
  and duplicate-free RS cases (model.py:229-343).

Fit is driver-side on a BOUNDED feature sample (training frames are small
by construction, exactly like RF training); scoring is an actor-pool
``map_batches`` that broadcasts the tiny fitted state (two mean vectors,
two covariance matrices, one prior) via ``ray.put`` — the RFScorer surface
(matcher.py:218-256).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

log = logging.getLogger(__name__)

DEL = 1e-300


# ---------------------------------------------------------------------------
# numpy stand-ins for the scipy/sklearn pieces the reference leans on
# ---------------------------------------------------------------------------


def mvn_logpdf(X: np.ndarray, mu: np.ndarray, cov: np.ndarray) -> np.ndarray:
    """``scipy.stats.multivariate_normal.logpdf(..., allow_singular=True)``:
    eigendecompose, drop near-null directions (pseudo-inverse semantics),
    log-density over the retained rank."""
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    w, v = np.linalg.eigh((cov + cov.T) / 2.0)
    tol = max(cov.shape[0], 1) * np.finfo(np.float64).eps * max(w.max(), 0.0)
    keep = w > tol
    rank = int(keep.sum())
    if rank == 0:
        return np.full(X.shape[0], -0.5 * X.shape[1] * np.log(2 * np.pi))
    logdet = float(np.sum(np.log(w[keep])))
    # whiten: (X - mu) @ V_k / sqrt(w_k)
    z = (X - mu) @ v[:, keep] / np.sqrt(w[keep])
    maha = np.einsum("ij,ij->i", z, z)
    return -0.5 * (rank * np.log(2 * np.pi) + logdet + maha)


def _minmax_scale(x: np.ndarray) -> np.ndarray:
    """sklearn MinMaxScaler.fit_transform per column; constant columns -> 0
    (sklearn maps them to 0 via its zero-range guard)."""
    lo = x.min(axis=0)
    rng = x.max(axis=0) - lo
    rng = np.where(rng == 0, 1.0, rng)
    return (x - lo) / rng


def y_init_scaled_sum(X: np.ndarray, threshold: float = 0.8) -> np.ndarray:
    """``get_y_init_given_threshold`` (model.py:21-28): min-max scale the
    features, min-max scale the row sums, label rows above the threshold."""
    scaled = _minmax_scale(np.asarray(X, dtype=np.float64))
    sums = scaled.sum(axis=1).reshape(-1, 1)
    return (_minmax_scale(sums)[:, 0] > threshold).astype(np.int64)


def bay_coeff(a: np.ndarray, b: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Bhattacharyya coefficient of two 1-d Gaussians (model.py:39-40)."""
    return np.exp(-(np.log(a / (b + DEL) + b / (a + DEL) + 2) + u / (a + b + DEL)))


def _secant_kappa(a: np.ndarray, b: np.ndarray, u: np.ndarray,
                  target: np.ndarray, x0: np.ndarray,
                  maxiter: int = 5, tol: float = 1.0) -> np.ndarray:
    """Vectorized secant iteration for ``bay_coeff(a+x, b+x, u) == target``,
    the iteration ``scipy.optimize.newton(f, x0=x0, x1=0)`` runs when given
    two starting points (model.py:388-392; maxiter=5, tol=1 as in the
    reference — a deliberately loose solve, kappa is a regularizer)."""
    p0 = np.asarray(x0, dtype=np.float64).copy()
    p1 = np.zeros_like(p0)
    f0 = bay_coeff(a + p0, b + p0, u) - target
    f1 = bay_coeff(a + p1, b + p1, u) - target
    p = p1.copy()
    for _ in range(maxiter):
        denom = f1 - f0
        safe = np.abs(denom) > 1e-30
        step = np.where(safe, f1 * (p1 - p0) / np.where(safe, denom, 1.0), 0.0)
        p = p1 - step
        if np.all(np.abs(p - p1) < tol):
            break
        p0, f0 = p1, f1
        p1 = p
        f1 = bay_coeff(a + p1, b + p1, u) - target
    return p


class ConvergenceMeter:
    """model.py:43-66: converged when the mean of the last N diffs of the
    offered values drops below the rate threshold."""

    def __init__(self, num_converged: int, rate_threshold: float, diff_fn=None):
        self._n = num_converged
        self._rate = rate_threshold
        self._diff = diff_fn or (lambda a, b: abs(a - b))
        self._hist: list[float] = []
        self._last = None

    def offer(self, val):
        if self._last is not None:
            self._hist.append(self._diff(val, self._last))
        self._last = val

    @property
    def is_converged(self) -> bool:
        if len(self._hist) < self._n:
            return False
        return float(np.mean(self._hist[-self._n:])) <= self._rate


# ---------------------------------------------------------------------------
# the EM model
# ---------------------------------------------------------------------------


class ZeroEREM:
    """Driver-side ZeroER EM fit over a bounded feature matrix.

    Mirrors ``ZeroerModel`` (model.py:70-478).  The fitted state that
    scoring needs is tiny: ``Mu_M/Mu_U`` (d), ``Cov_M/Cov_U`` (d x d),
    ``pi_M`` — safely broadcastable to every scoring actor.
    """

    def __init__(self, X: np.ndarray, feature_names: list[str], *,
                 c_bay: float = 0.015, pi_M: float | None = None,
                 hard: bool = False):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[0] < 2:
            raise ValueError("ZeroER needs a 2-d feature matrix with >= 2 rows")
        self.X = X
        self.feature_names = list(feature_names)
        self.c_bay = c_bay
        self._hard = hard
        n, d = X.shape

        # init labels from the scaled-sum threshold (model.py:90); the
        # passed-in y only seeds pi_M in the reference — same here
        self.y = y_init_scaled_sum(X)
        if pi_M is None:
            pi_M = float(self.y.sum()) / float(len(self.y))
        self.pi_M = pi_M

        # Pearson correlations drive the in-group off-diagonals; constant
        # columns have undefined corr -> 0 (the reference would propagate
        # NaN and crash; treating no-signal as uncorrelated is the only
        # non-degenerate reading)
        sd = X.std(axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.corrcoef(X, rowvar=False)
        if np.isscalar(c) or c.ndim == 0:  # d == 1
            c = np.ones((1, 1))
        self.corr = np.nan_to_num(c, nan=0.0)
        np.fill_diagonal(self.corr, 1.0)
        self.sigma = np.diag(sd)

        # attribute groups: leading "_"-segment of the feature name
        # (model.py:109-114); our features are attr_sim_tok so this groups
        # by attribute exactly like the reference's py_entitymatching names
        self.groups: dict[str, list[int]] = {}
        for i, name in enumerate(self.feature_names):
            self.groups.setdefault(name.split("_")[0], []).append(i)

        # per-feature class Gaussians from the init labels; GaussianMixture
        # adds reg_covar=1e-6 to the variance (model.py:153-165)
        self.Mu_M = np.zeros(d)
        self.Mu_U = np.zeros(d)
        self.Cov_M = np.zeros((d, d))
        self.Cov_U = np.zeros((d, d))
        for i in range(d):
            for label, mu_vec, cov_mat in ((0, self.Mu_U, self.Cov_U),
                                           (1, self.Mu_M, self.Cov_M)):
                vals = X[self.y == label, i]
                if vals.size == 0:  # degenerate init: fall back to all rows
                    vals = X[:, i]
                mu_vec[i] = vals.mean()
                cov_mat[i, i] = vals.var() + 1e-6
        self.P_M = np.zeros(n)
        self.Q_M = np.zeros(n)
        self.Q_U = np.zeros(n)

    # -- EM steps ----------------------------------------------------------

    @staticmethod
    def _psd_repair(cov: np.ndarray) -> np.ndarray:
        """model.py:174-185: ridge then reflect negative eigenvalues."""
        cov = cov + 1e-8 * np.eye(cov.shape[0])
        min_eig = float(np.min(np.real(np.linalg.eigvals(cov))))
        if min_eig < 0:
            cov = cov - 10 * min_eig * np.eye(cov.shape[0])
        return cov

    def e_step(self) -> None:
        self.Cov_M = self._psd_repair(self.Cov_M)
        self.Cov_U = self._psd_repair(self.Cov_U)
        self.Q_M = mvn_logpdf(self.X, self.Mu_M, self.Cov_M)
        self.Q_U = mvn_logpdf(self.X, self.Mu_U, self.Cov_U)
        ratio = np.exp(np.clip(self.Q_U - self.Q_M, -500, 500))
        self.P_M = self.pi_M / (self.pi_M + (1 - self.pi_M) * ratio)
        if self._hard:
            self.P_M = np.round(np.clip(self.P_M, 0.0, 1.0))

    def m_step(self) -> None:
        X, n, d = self.X, self.X.shape[0], self.X.shape[1]
        P_M = self.P_M
        P_U = 1.0 - P_M
        N_M = float(P_M.sum())
        N_U = n - N_M
        self.pi_M = N_M / n

        pm = P_M.reshape(-1, 1)
        pu = P_U.reshape(-1, 1)
        self.Mu_M = (pm * X).sum(axis=0) / (N_M + DEL)
        self.Mu_U = (pu * X).sum(axis=0) / (N_U + DEL)

        dM = X - self.Mu_M
        dU = X - self.Mu_U
        std_M = np.sqrt((pm[:, 0:1].T @ (dM ** 2)).ravel() / (N_M + DEL)) + 1e-100
        std_U = np.sqrt((pu[:, 0:1].T @ (dU ** 2)).ravel() / (N_U + DEL)) + 1e-100
        Cov_M = dM.T @ (pm * dM) / (N_M + DEL)
        Cov_U = dU.T @ (pu * dU) / (N_U + DEL)

        # Bhattacharyya-targeted kappa regularization (model.py:379-395)
        a = np.diag(Cov_M).copy()
        b = np.diag(Cov_U).copy()
        u = (self.Mu_M - self.Mu_U) ** 2
        smooth = np.abs(self.Mu_M - self.Mu_U) ** 2
        bay_ori = bay_coeff(a, b, u)
        target = bay_ori + self.c_bay
        over = target >= 1
        target[over] = bay_ori[over] / 2 + 0.5
        kappas = _secant_kappa(a, b, u, target, x0=0.15 * smooth)
        kappas = np.nan_to_num(np.clip(kappas, 0.0, 1.0), posinf=0.0, neginf=0.0)

        # group-block covariance: in-group off-diagonals from the fixed
        # Pearson corr and the class stds, diagonal + kappa; cross-group 0
        # (model.py:399-409)
        newM = np.zeros((d, d))
        newU = np.zeros((d, d))
        for cols in self.groups.values():
            for c1 in cols:
                for c2 in cols:
                    if c1 == c2:
                        newM[c1, c1] = Cov_M[c1, c1] + kappas[c1]
                        newU[c1, c1] = Cov_U[c1, c1] + kappas[c1]
                    else:
                        newM[c1, c2] = self.corr[c1, c2] * std_M[c1] * std_M[c2]
                        newU[c1, c2] = self.corr[c1, c2] * std_U[c1] * std_U[c2]
        self.Cov_M, self.Cov_U = newM, newU

    def free_energy(self) -> np.ndarray:
        P_M, P_U = self.P_M, 1.0 - self.P_M
        return (P_M * (np.log(self.pi_M + DEL) - np.log(P_M + DEL) + self.Q_M)
                + P_U * (np.log(1 - self.pi_M + DEL) - np.log(P_U + DEL) + self.Q_U))

    def fit(self, max_iter: int = 40) -> "ZeroEREM":
        """run_em loop (model.py:427-478), single-model path."""
        meter = ConvergenceMeter(10, 0.01,
                                 diff_fn=lambda a, b: float(np.linalg.norm(a - b)))
        for _ in range(max_iter):
            self.e_step()
            self.m_step()
            meter.offer(self.free_energy())
            if meter.is_converged:
                break
        return self

    # -- scoring ------------------------------------------------------------

    def slim(self) -> "ZeroEREM":
        """Drop the training-sample arrays before broadcasting: scoring only
        needs Mu/Cov/pi (~KB); shipping X to every actor would re-broadcast
        the whole training sample."""
        self.X = self.y = self.P_M = self.Q_M = self.Q_U = None  # type: ignore
        return self

    def predict_proba(self, X_test: np.ndarray) -> np.ndarray:
        """P(match) for unseen pairs (model.py:206-227, without the final
        rounding — labels come from thresholding at 0.5 downstream)."""
        Cov_M = self._psd_repair(self.Cov_M)
        Cov_U = self._psd_repair(self.Cov_U)
        lm = mvn_logpdf(X_test, self.Mu_M, Cov_M)
        lu = mvn_logpdf(X_test, self.Mu_U, Cov_U)
        ratio = np.exp(np.clip(lu - lm, -500, 500))
        return self.pi_M / (self.pi_M + (1 - self.pi_M) * ratio)

    # -- transitivity (self-join / dup-free variants) ------------------------

    def _L(self, q: float, i: int) -> float:
        return (q * (np.log(self.pi_M + DEL) + self.Q_M[i] - np.log(q + DEL))
                + (1 - q) * (np.log(1 - self.pi_M + DEL) + self.Q_U[i]
                             - np.log(1 - q + DEL)))

    def _delta_L(self, q: float, i: int) -> float:
        delta = self._L(q, i) - self._L(self.P_M[i], i)
        return -1e200 if delta > 1e-5 else delta

    def enforce_transitivity(self, ids: np.ndarray, *,
                             lr_identical: bool = True) -> np.ndarray:
        """Single-table transitivity repair (model.py:229-343, the
        ``LR_identical`` / ``LR_dup_free`` paths; the three-model RS variant
        is out of scope — the reference only wires it for specific RS
        datasets).  For predicted pairs (a,b),(a,c) with P(a,b)P(a,c) >
        P(b,c), lower whichever probability costs the least free energy.
        Driver-side over PREDICTED matches only (bounded)."""
        idx = {}
        for i in range(ids.shape[0]):
            idx[(ids[i, 0], ids[i, 1])] = i
            idx[(ids[i, 1], ids[i, 0])] = i
        P_M = self.P_M.copy()
        # the reference builds the predicted list ONCE (model.py:240-243)
        # and re-sorts that same list for the second pass (model.py:292)
        pred = [(ids[i, 0], ids[i, 1]) for i in range(P_M.shape[0])
                if P_M[i] > 0.5]

        for sort_key, shared_pos, other_pos in ((None, 0, 1), (1, 1, 0)):
            pred.sort(key=(lambda t: (t[1], t[0])) if sort_key else None)
            for i in range(len(pred)):
                for j in range(i + 1, len(pred)):
                    if pred[j][shared_pos] != pred[i][shared_pos]:
                        break
                    i1, i2 = idx[pred[i]], idx[pred[j]]
                    p1, p2 = P_M[i1], P_M[i2]
                    third = (pred[i][other_pos], pred[j][other_pos])
                    if lr_identical and third in idx:
                        p3, i3 = P_M[idx[third]], idx[third]
                    else:
                        p3, i3 = 0.0, -1
                    if p1 * p2 > p3:
                        deltas = [self._delta_L(p3 / (p2 + DEL), i1),
                                  self._delta_L(p3 / (p1 + DEL), i2)]
                        if i3 != -1:
                            deltas.append(self._delta_L(p1 * p2, i3))
                        k = int(np.argmax(deltas))
                        if deltas[k] > -1e100:
                            if k == 0:
                                P_M[i1] = p3 / (p2 + DEL)
                            elif k == 1:
                                P_M[i2] = p3 / (p1 + DEL)
                            else:
                                P_M[i3] = p1 * p2
        self.P_M = P_M
        return P_M


# ---------------------------------------------------------------------------
# Ray surface: bounded driver fit + actor-pool scoring
# ---------------------------------------------------------------------------


class ZeroerScorer:
    """Actor-pool scorer over feature batches — the RFScorer contract
    (matcher.py:218-243): same output schema, model fetched once per actor."""

    def __init__(self, model_ref, feature_cols, threshold: float = 0.5):
        self.model: ZeroEREM = ray.get(model_ref)
        self.cols = list(feature_cols)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id1": pa.array([], pa.string()), "id2": pa.array([], pa.string()),
                 "proba": pa.array([], pa.float64()), "label": pa.array([], pa.int8())}
            )
        X = np.column_stack(
            [np.nan_to_num(np.asarray(t.column(c), dtype=np.float64)) for c in self.cols]
        )
        p = self.model.predict_proba(X)
        return pa.table(
            {
                "id1": t.column("id1"),
                "id2": t.column("id2"),
                "proba": pa.array(p, pa.float64()),
                "label": pa.array((p >= self.threshold).astype(np.int8), pa.int8()),
            }
        )


def zeroer_match(
    features: "ray.data.Dataset",
    feature_cols: list[str],
    *,
    c_bay: float = 0.015,
    max_iter: int = 40,
    threshold: float = 0.5,
    sample_limit: int = 500_000,
    run_transitivity: bool = False,
    concurrency=(1, 8),
    seed: int = 42,
) -> "ray.data.Dataset":
    """Unsupervised match labeling over a (id1, id2, features...) Dataset.

    EM fits driver-side on a bounded sample (first ``sample_limit`` feature
    rows — the same bounded-training contract as the RF path); the fitted
    ~KB-sized state broadcasts once and every pair is scored in a streaming
    actor pool.  ``run_transitivity`` applies the reference's self-join
    repair to the sampled rows only (it needs random access to P_M) and is
    therefore skipped with a warning when the input exceeds the sample."""
    sample = features.limit(sample_limit).select_columns(
        ["id1", "id2", *feature_cols]).to_pandas()
    if len(sample) == 0:
        raise ValueError("zeroer_match: empty feature input")
    X = np.nan_to_num(sample[feature_cols].to_numpy(dtype=np.float64))
    model = ZeroEREM(X, feature_cols, c_bay=c_bay).fit(max_iter=max_iter)

    if run_transitivity:
        if len(sample) >= sample_limit:
            log.warning(
                "zeroer_match: input exceeds sample_limit=%d — transitivity "
                "repair needs the full pair set driver-side, skipping", sample_limit)
        else:
            model.enforce_transitivity(sample[["id1", "id2"]].to_numpy())

    ref = ray.put(model.slim())
    return features.map_batches(
        ZeroerScorer,
        fn_constructor_args=(ref, feature_cols, threshold),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
