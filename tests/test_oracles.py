"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() twin via DuckDB (row count +
schema + order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def contract(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    importlib.reload(e)
    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLE_NAMES = [
    "canonicalize", "token_df", "block_jac", "block_overlap", "block_exm_head",
    "block_anm_turns", "block_lev_head", "block_lev_sim", "block_rules_union",
    "topk_blended",
    "cluster_jac", "megallen_wide", "dedup_exact_docs",
    "dedup_token_jac_docs", "ann_topk", "embed_dup_pairs", "text_stats",
    "lang_id", "events_window",
    "block_jac_rs", "block_overlap_rs", "block_exm_rs", "block_anm_rs",
    "block_lev_rs", "block_jac_weighted",
    "topk_allscore", "topk_allscore_weighted", "quality_docs",
    "block_fused_union", "block_dice", "block_jac_weighted_rs", "token_df_qgram",
    "events_sessionize", "events_asof", "events_in_sessions",
    "tpch_pricing", "tpch_top_customers",
    "simhash_docs", "fingerprint_winnow", "ann_topk_ivf",
    "minhash_lsh_docs", "er_f1_report", "rule_recall", "sample_down",
    "dedup_near_docs", "embed_dup_pairs_lsh",
]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(contract, con, name):
    qs = contract.queries()
    sql = contract.oracle_sql()
    assert name in qs and name in sql
    got = _norm(_to_pandas(qs[name](SF_DIR)))
    exp = _norm(con.sql(sql[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


# Representative queries spanning every broadcast-or-hash_join verify family
# (set-sim self join, RS join, wide join, CC clustering, minhash dedup): with
# GRAFT_BROADCAST_LIMIT=0 every gate lands on the join/demand-semi-join path —
# the one a beyond-broadcast (100x-scale) run actually takes — and the output
# must stay oracle-identical.
JOIN_PATH_NAMES = ["block_jac", "block_jac_rs", "megallen_wide",
                   "cluster_jac", "minhash_lsh_docs", "dedup_token_jac_docs",
                   "block_jac_weighted", "block_jac_weighted_rs",
                   "block_lev_head", "block_lev_rs", "block_lev_sim"]


@pytest.mark.parametrize("name", JOIN_PATH_NAMES)
def test_query_matches_oracle_join_path(contract, con, name, monkeypatch):
    monkeypatch.setenv("GRAFT_BROADCAST_LIMIT", "0")
    qs = contract.queries()
    sql = contract.oracle_sql()
    got = _norm(_to_pandas(qs[name](SF_DIR)))
    exp = _norm(con.sql(sql[name]).df())
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


ROWS_ONLY = ["multimodal_decode", "group_values", "ic_graph", "er_zeroer"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(contract, name):
    got = _to_pandas(contract.queries()[name](SF_DIR))
    assert len(got) >= 0
    if name == "er_f1_report":
        assert got.iloc[0]["match_f1"] >= 0.99, got.to_dict("records")
    if name == "minhash_lsh_docs":
        assert set(got.columns) == {"id1", "id2", "sim"}
    if name == "multimodal_decode":
        assert len(got) == 200


def test_entry_smoke(contract):
    res = contract.entry()
    df = _to_pandas(res)
    assert len(df) > 0 and set(df.columns) == {"conv_id", "entity_id"}


def test_rule_from_feature_name_aliases():
    """Reference alias sim names and two-segment lev forms parse
    (graph.py sort_ranges2 builds lev_sim/lev_dist; long alias names
    jaccard/cosine/exact/abs appear in py_entitymatching features)."""
    from entityblockingbysimilarityjoins_ray.config import rule_from_feature_name

    r = rule_from_feature_name("title_title_jaccard_dlm", 0.7)
    assert (r.attr, r.sim, r.tok) == ("title", "jac", "dlm")
    r = rule_from_feature_name("name_cosine_qgm3", 0.6)
    assert (r.attr, r.sim, r.tok, r.q) == ("name", "cos", "qgm", 3)
    r = rule_from_feature_name("head_exact", 1.0)
    assert (r.attr, r.sim) == ("head", "exm")
    r = rule_from_feature_name("price_abs", 0.9)
    assert (r.attr, r.sim) == ("price", "anm")
    r = rule_from_feature_name("title_title_lev_sim", 0.8)
    assert (r.attr, r.sim) == ("title", "lev")
    r = rule_from_feature_name("title_lev_dist", 3.0)
    assert (r.attr, r.sim) == ("title", "lev")
