"""Checkpointed stage outputs with per-partition lineage manifests.

The reference's resumability is implicit (each stage re-reads its
predecessor's CSV files, output/buffer -> output/blk_res -> ...;
/root/reference/simjoin_entitymatching/utils/path_helper.py:1-80).  Here it is
explicit, the north rule's "resumable from checkpoint with per-partition
lineage + metrics":

- each stage writes a Parquet DIRECTORY (Ray part files = the chunking the
  reference implements by hand with 1M-row blk_res{i}.csv files,
  io.cc:989-1069),
- an atomic ``_MANIFEST.json`` records the stage's input fingerprint
  (config + upstream fingerprint hash), row count, per-file row counts and
  wall time,
- on resume, a stage whose manifest exists AND whose fingerprint matches is
  loaded with ``read_parquet`` instead of recomputed; a fingerprint mismatch
  invalidates the checkpoint and everything downstream.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data

MANIFEST = "_MANIFEST.json"


def fingerprint(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def checkpoint_stage(
    ds_factory,
    stage_dir: str,
    fp: str,
    *,
    resume: bool = True,
) -> tuple["ray.data.Dataset", dict]:
    """Run-or-load one stage.

    ``ds_factory()`` builds the stage Dataset lazily; it only executes when
    the checkpoint is missing/stale.  Returns (dataset, manifest_dict)."""
    mpath = os.path.join(stage_dir, MANIFEST)
    if resume and os.path.exists(mpath):
        with open(mpath) as f:
            man = json.load(f)
        if man.get("fingerprint") == fp and man.get("complete"):
            return ray.data.read_parquet(stage_dir), man
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    tmp = stage_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.time()
    ds = ds_factory()
    ds.write_parquet(tmp)
    files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    import pyarrow.parquet as pq

    per_part = {f: pq.read_metadata(os.path.join(tmp, f)).num_rows for f in files}
    man = {
        "fingerprint": fp,
        "complete": True,
        "rows": int(sum(per_part.values())),
        "partitions": per_part,
        "wall_sec": round(time.time() - t0, 3),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(man, f, indent=1)
    os.rename(tmp, stage_dir)
    return ray.data.read_parquet(stage_dir), man


def _strip_meta(t):
    """Drop schema-level metadata (zero-copy).

    Parquet written by pandas carries a ``pandas`` schema-metadata dict that
    makes ``pyarrow.Schema`` UNHASHABLE — Ray Data's schema-dedup then logs
    'Failed to hash the schemas' per block and re-unifies schemas on every
    operator boundary.  Stripping it once at the read restores hashable
    schemas for the whole downstream plan."""
    return t.replace_schema_metadata(None)


def read_parquet_clean(path, columns=None, **kw) -> "ray.data.Dataset":
    """``read_parquet`` with column pruning + schema-metadata strip."""
    ds = ray.data.read_parquet(path, columns=columns, **kw)
    return ds.map_batches(_strip_meta, batch_format="pyarrow")


def read_transcripts(path: str, columns=None) -> "ray.data.Dataset":
    """Parquet transcript source with column pruning at the read."""
    return read_parquet_clean(path, columns=columns)


def read_csv_clean(path, columns=None, **kw) -> "ray.data.Dataset":
    """CSV source (the reference's own datasets ship as CSV,
    /root/reference/cpp/common/io.h:44-81): Arrow-native read with optional
    column projection + the same schema-metadata strip as the Parquet path."""
    ds = ray.data.read_csv(path, **kw)
    if columns:
        ds = ds.select_columns(columns)
    return ds.map_batches(_strip_meta, batch_format="pyarrow")
