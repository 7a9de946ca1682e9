"""ZeroER unsupervised EM matcher: numpy-kernel oracles + planted-gold
decisions + the actor-pool scoring surface."""

import numpy as np
import pandas as pd
import pytest

from entityblockingbysimilarityjoins_ray.stages.zeroer import (
    ConvergenceMeter,
    ZeroEREM,
    bay_coeff,
    mvn_logpdf,
    y_init_scaled_sum,
    zeroer_match,
)


def test_mvn_logpdf_matches_dense_formula():
    rng = np.random.default_rng(7)
    d = 4
    A = rng.normal(size=(d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    mu = rng.normal(size=d)
    X = rng.normal(size=(16, d))
    got = mvn_logpdf(X, mu, cov)
    inv = np.linalg.inv(cov)
    _, logdet = np.linalg.slogdet(cov)
    diff = X - mu
    exp = -0.5 * (d * np.log(2 * np.pi) + logdet
                  + np.einsum("ij,jk,ik->i", diff, inv, diff))
    np.testing.assert_allclose(got, exp, rtol=1e-10)


def test_mvn_logpdf_singular_cov_is_finite():
    # rank-1 covariance: pseudo-inverse semantics, no crash, finite values
    v = np.array([1.0, 2.0])
    cov = np.outer(v, v)
    out = mvn_logpdf(np.array([[1.0, 2.0], [0.0, 0.0]]), np.zeros(2), cov)
    assert np.all(np.isfinite(out))


def test_y_init_scaled_sum_separates_obvious_groups():
    X = np.vstack([np.full((20, 3), 0.05), np.full((5, 3), 0.95)])
    X += np.random.default_rng(0).normal(0, 0.01, X.shape)
    y = y_init_scaled_sum(X)
    assert y[:20].sum() == 0 and y[20:].sum() == 5


def test_bay_coeff_bounds():
    a = np.array([0.01, 0.2])
    b = np.array([0.02, 0.2])
    u = np.array([0.5, 0.0])
    c = bay_coeff(a, b, u)
    assert np.all(c > 0) and np.all(c <= 1.0)
    # identical Gaussians -> coefficient 1/4 * ... actually exp(-log(4)) = 0.25
    np.testing.assert_allclose(bay_coeff(np.array([0.2]), np.array([0.2]),
                                         np.array([0.0])), [0.25], rtol=1e-12)


def test_convergence_meter():
    m = ConvergenceMeter(3, 0.1)
    for v in [10.0, 5.0, 4.9, 4.85, 4.84]:
        m.offer(v)
    assert m.is_converged


def _planted(n_match=60, n_unmatch=540, seed=3):
    rng = np.random.default_rng(seed)
    Xm = np.clip(rng.normal(0.88, 0.05, size=(n_match, 4)), 0, 1)
    Xu = np.clip(rng.normal(0.12, 0.06, size=(n_unmatch, 4)), 0, 1)
    X = np.vstack([Xm, Xu])
    y = np.concatenate([np.ones(n_match, np.int64), np.zeros(n_unmatch, np.int64)])
    ids = np.array([[f"a{i:04d}", f"b{i:04d}"] for i in range(len(y))])
    cols = ["doc_jac_dlm", "doc_cos_dlm", "head_jac_dlm", "head_cos_qgm3"]
    return X, y, ids, cols


def test_em_reaches_threshold_decisions_on_separable_fixture():
    X, y, _, cols = _planted()
    model = ZeroEREM(X, cols).fit()
    pred = (model.predict_proba(X) >= 0.5).astype(np.int64)
    # same decisions as a mean-score threshold matcher on this separable set
    thresh = (X.mean(axis=1) >= 0.5).astype(np.int64)
    np.testing.assert_array_equal(pred, thresh)
    np.testing.assert_array_equal(pred, y)
    assert 0.05 < model.pi_M < 0.2  # learned prior near the true 10%


def test_em_kappa_regularization_keeps_cov_valid():
    X, _, _, cols = _planted(seed=11)
    model = ZeroEREM(X, cols).fit(max_iter=10)
    for cov in (model.Cov_M, model.Cov_U):
        w = np.linalg.eigvalsh((cov + cov.T) / 2)
        assert w.min() > -1e-8  # PSD after the group-block rebuild
    # group structure: cross-group entries are exactly zero
    names = model.feature_names
    for i, ni in enumerate(names):
        for j, nj in enumerate(names):
            if ni.split("_")[0] != nj.split("_")[0]:
                assert model.Cov_M[i, j] == 0.0


def test_transitivity_repair_lowers_violating_pair():
    # a-b and a-c predicted matches, b-c absent: P(ab)*P(ac) > 0 must be
    # repaired by lowering one of them (dup-free semantics: p_third = 0)
    X = np.array([[0.9, 0.9], [0.9, 0.9], [0.1, 0.1], [0.1, 0.15]])
    ids = np.array([["a", "b"], ["a", "c"], ["d", "e"], ["f", "g"]])
    model = ZeroEREM(np.vstack([X] * 5), ["f1_a", "f2_b"]).fit(max_iter=5)
    model.X = X
    model.e_step()
    before = model.P_M.copy()
    assert before[0] > 0.5 and before[1] > 0.5
    after = model.enforce_transitivity(ids, lr_identical=False)
    assert (after <= before + 1e-12).all()
    assert min(after[0], after[1]) < 0.5 or np.allclose(after[:2], before[:2], atol=1e-9), \
        "violating pair should be demoted unless free energy forbids it"
    assert np.all((after >= 0) & (after <= 1))


def test_zeroer_match_dataset_surface(ray_session):
    import ray

    X, y, ids, cols = _planted(seed=5)
    df = pd.DataFrame(X, columns=cols)
    df.insert(0, "id2", ids[:, 1])
    df.insert(0, "id1", ids[:, 0])
    ds = ray.data.from_pandas(df)
    out = zeroer_match(ds, cols).to_pandas()
    assert set(out.columns) == {"id1", "id2", "proba", "label"}
    assert len(out) == len(df)
    merged = out.merge(df[["id1", "id2"]].assign(gold=y), on=["id1", "id2"])
    np.testing.assert_array_equal(
        merged.sort_values("id1")["label"].to_numpy(np.int64),
        merged.sort_values("id1")["gold"].to_numpy(np.int64),
    )


def test_zeroer_match_empty_raises(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"id1": [], "id2": [], "f_a": []}))
    with pytest.raises(ValueError):
        zeroer_match(ds, ["f_a"])
