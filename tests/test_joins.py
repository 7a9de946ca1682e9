"""hash_join (engine-owned shuffle join) — correctness incl. the empty-Arrow-
block pattern that breaks Ray 2.49's native Dataset.join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from entityblockingbysimilarityjoins_ray.stages.joins import hash_join


def test_basic_inner_join(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"id": ["a", "b", "c"], "x": [1, 2, 3]}))
    r = ray.data.from_pandas(pd.DataFrame({"rid": ["a", "c", "d"], "y": [10.0, 30.0, 40.0]}))
    out = hash_join(l, r, on="id", right_on="rid", num_partitions=4).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == ["a", "c"]
    assert list(out["x"]) == [1, 3]
    assert list(out["y"]) == [10.0, 30.0]
    assert "rid" not in out.columns


def test_join_with_empty_arrow_blocks(ray_session):
    empty = pa.table({"id1": pa.array([], pa.string()), "id2": pa.array([], pa.string())})
    full = pa.table({"id1": ["a", "b"], "id2": ["x", "y"]})
    l = ray.data.from_arrow([empty, full, empty])
    r = ray.data.from_pandas(pd.DataFrame({"rid": ["x", "y"], "v": [1, 2]}))
    out = hash_join(l, r, on="id2", right_on="rid", num_partitions=4).to_pandas()
    assert sorted(out["id1"]) == ["a", "b"]


def test_join_duplicate_keys_multiplies(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": ["a", "a", "b"], "x": [1, 2, 3]}))
    r = ray.data.from_pandas(pd.DataFrame({"rk": ["a", "a"], "y": [10, 20]}))
    out = hash_join(l, r, on="k", right_on="rk", num_partitions=2).to_pandas()
    assert len(out) == 4  # 2x2 for key 'a'


def test_join_same_key_name(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"], "x": [1, 2]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"], "y": [5, 6]}))
    out = hash_join(l, r, on="k", right_on="k", num_partitions=2).to_pandas()
    assert sorted(out.columns) == ["k", "x", "y"]
    assert len(out) == 2


def test_join_int_keys(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": ["a", "b", "c"]}))
    r = ray.data.from_pandas(pd.DataFrame({"rk": [2, 3, 4], "y": [2.0, 3.0, 4.0]}))
    out = hash_join(l, r, on="k", right_on="rk", num_partitions=4).to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_verify_join_mode_equals_broadcast(tiny_docs):
    """verify_pairs(broadcast=False) must produce the same verified pairs."""
    from entityblockingbysimilarityjoins_ray.config import PipelineConfig
    from entityblockingbysimilarityjoins_ray.stages.blocking import (
        setsim_self_join,
        tokenize_docs,
    )

    docs, _ = tiny_docs
    toks = tokenize_docs(docs, "doc", "dlm").materialize()
    cfg = PipelineConfig(pair_partitions=8)
    a = setsim_self_join(toks, sim="jac", threshold=0.6, cfg=cfg, broadcast=True)
    b = setsim_self_join(toks, sim="jac", threshold=0.6, cfg=cfg, broadcast=False)
    pa_ = a.to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    pb_ = b.to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_[["id1", "id2", "sim"]], pb_[["id1", "id2", "sim"]])


# ---------------------------------------------------------------------------
# as-of join (DuckDB ASOF JOIN semantics)
# ---------------------------------------------------------------------------


def _asof_fixture():
    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "lid": np.arange(n_l, dtype=np.int64),
        "user": rng.integers(0, 25, n_l),
        "lts": rng.integers(0, 10_000, n_l).astype("datetime64[s]").astype("datetime64[us]"),
        "lval": rng.normal(size=n_l),
    })
    right = pd.DataFrame({
        "rid": np.arange(n_r, dtype=np.int64),
        "user": rng.integers(0, 25, n_r),
        "rts": rng.integers(0, 10_000, n_r).astype("datetime64[s]").astype("datetime64[us]"),
        "rval": rng.normal(size=n_r),
    })
    # unique (user, rts) so the as-of winner is unambiguous
    right = right.drop_duplicates(["user", "rts"]).reset_index(drop=True)
    return left, right


def test_asof_join_matches_duckdb(ray_session):
    import duckdb

    from entityblockingbysimilarityjoins_ray.stages.joins import asof_join

    left, right = _asof_fixture()
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="user", left_ts="lts", right_ts="rts", num_partitions=8,
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql("""
        SELECT l.lid, l.user, l.lts, l.lval, r.rid, r.rts, r.rval
        FROM l ASOF JOIN r ON l.user = r.user AND l.lts >= r.rts
        ORDER BY l.lid
    """).df().reset_index(drop=True)
    assert len(got) == len(exp)
    got = got[exp.columns.tolist()]
    for c in ("lid", "user", "rid"):
        assert np.array_equal(got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64)), c
    for c in ("lts", "rts"):
        assert np.array_equal(got[c].to_numpy("datetime64[us]"),
                              exp[c].to_numpy("datetime64[us]")), c
    for c in ("lval", "rval"):
        assert np.allclose(got[c], exp[c]), c


def test_asof_join_left_and_forward(ray_session):
    from entityblockingbysimilarityjoins_ray.stages.joins import asof_join

    left, right = _asof_fixture()
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="user", left_ts="lts", right_ts="rts", how="left", num_partitions=8,
    ).to_pandas()
    assert len(out) == len(left)  # left join keeps unmatched rows
    # brute-force check a few rows
    for _, row in out.head(50).iterrows():
        cand = right[(right["user"] == row["user"]) & (right["rts"] <= row["lts"])]
        if len(cand):
            assert row["rts"] == cand["rts"].max()
        else:
            assert pd.isna(row["rts"])

    fwd = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="user", left_ts="lts", right_ts="rts", direction="forward",
        num_partitions=8,
    ).to_pandas()
    for _, row in fwd.head(50).iterrows():
        cand = right[(right["user"] == row["user"]) & (right["rts"] >= row["lts"])]
        assert len(cand) and row["rts"] == cand["rts"].min()


def test_interval_join_matches_duckdb(ray_session):
    """Keyed range join vs a DuckDB BETWEEN join — overlapping intervals
    included (a point matches every containing interval)."""
    import duckdb

    from entityblockingbysimilarityjoins_ray.stages.joins import interval_join

    rng = np.random.default_rng(13)
    pts = pd.DataFrame({
        "pid": np.arange(500, dtype=np.int64),
        "k": rng.integers(0, 20, 500),
        "v": rng.integers(0, 1000, 500),
    })
    lo = rng.integers(0, 950, 200)
    iv = pd.DataFrame({
        "iid": np.arange(200, dtype=np.int64),
        "k": rng.integers(0, 20, 200),
        "lo": lo,
        "hi": lo + rng.integers(0, 400, 200),  # overlapping by construction
    })
    got = interval_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(iv),
        on="k", point_col="v", lo_col="lo", hi_col="hi", num_partitions=8,
    ).to_pandas().sort_values(["pid", "iid"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", iv)
    exp = con.sql("""
        SELECT p.pid, p.k, p.v, i.iid, i.lo, i.hi
        FROM p JOIN i ON p.k = i.k AND p.v BETWEEN i.lo AND i.hi
        ORDER BY p.pid, i.iid
    """).df().reset_index(drop=True)
    assert len(got) == len(exp) and len(exp) > 0
    got = got[exp.columns.tolist()]
    for c in exp.columns:
        assert np.array_equal(got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64)), c


def test_asof_interval_one_sided_buckets(ray_session):
    """Buckets holding only one side (disjoint key sets) produce zero inner
    rows; asof left-join keeps unmatched lefts with null right columns."""
    from entityblockingbysimilarityjoins_ray.stages.joins import (
        asof_join,
        interval_join,
    )

    left = pd.DataFrame({"lid": [0, 1], "user": [100, 200],
                         "lts": np.array([10, 20], "datetime64[s]").astype("datetime64[us]")})
    right = pd.DataFrame({"rid": [0], "user": [300],
                          "rts": np.array([5], "datetime64[s]").astype("datetime64[us]")})
    inner = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                      on="user", left_ts="lts", right_ts="rts",
                      num_partitions=4).to_pandas()
    assert len(inner) == 0
    lj = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                   on="user", left_ts="lts", right_ts="rts", how="left",
                   num_partitions=4).to_pandas()
    assert len(lj) == 2 and lj["rts"].isna().all()

    pts = pd.DataFrame({"pid": [0], "k": [7], "v": [5]})
    iv = pd.DataFrame({"iid": [0], "k": [9], "lo": [0], "hi": [10]})
    out = interval_join(ray.data.from_pandas(pts), ray.data.from_pandas(iv),
                        on="k", point_col="v", lo_col="lo", hi_col="hi",
                        num_partitions=4).to_pandas()
    assert len(out) == 0
