"""Edit-distance join vs exact cross-join oracle (DuckDB levenshtein) —
PassJoin semantics of the reference StringJoin (stringjoin.{h,cc})."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from entityblockingbysimilarityjoins_ray.config import PipelineConfig
from entityblockingbysimilarityjoins_ray.stages.editjoin import edit_self_join

CFG = PipelineConfig(pair_partitions=8)


def _mk_docs(rng):
    base = ["similarity join", "similarty join", "similarity joins", "entity blocking",
            "entty blocking", "a", "b", "ab", "", "record linkage", "record linkage!",
            "rec0rd linkage", "xyz", "xzy", "zzzzzzzzzz"]
    extra = ["".join(rng.choice(list("abcde"), size=rng.integers(3, 12))) for _ in range(60)]
    vals = base + extra
    return pd.DataFrame({"conv_id": [f"c{i:04d}" for i in range(len(vals))], "head": vals})


@pytest.mark.parametrize("D", [1, 2])
def test_edit_join_matches_duckdb(ray_session, D):
    rng = np.random.default_rng(7)
    df = _mk_docs(rng)
    ds = ray.data.from_pandas(df)
    got = edit_self_join(ds, "head", D, CFG).to_pandas()
    got_set = set(zip(got.id1, got.id2))
    con = duckdb.connect()
    exp = con.execute(
        "SELECT a.conv_id i1, b.conv_id i2 FROM df a JOIN df b ON a.conv_id < b.conv_id "
        f"WHERE levenshtein(a.head, b.head) <= {D}"
    ).df()
    assert got_set == set(zip(exp.i1, exp.i2))
    # sim column is the exact distance
    con.register("gotdf", got)
    chk = con.execute(
        "SELECT count(*) FROM gotdf g JOIN df a ON g.id1=a.conv_id JOIN df b ON g.id2=b.conv_id "
        "WHERE levenshtein(a.head, b.head) != g.sim"
    ).fetchone()[0]
    assert chk == 0
