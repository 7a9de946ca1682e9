"""Deterministic synthetic transcript tables (FIXTURES.md F1/F2).

The BASELINE.json input is a Parquet table of multi-turn conversation
transcripts ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.  The driver testdata has no such table, so
we synthesize it deterministically (seed=42, numpy PCG64) at a scale derived
from the testdata scale factor — no external data, identical across runs and
parallelism levels.

Planted ground truth: each *entity* spawns 1-6 conversation variants produced
by seeded edits of a base transcript (token swaps, turn drops, whitespace /
punctuation noise, synonym substitutions) mirroring the Megallen
structured/dirty/textual variants the reference evaluates on
(/root/reference/docs/exp.md:1-13).  ``gold_pairs`` (id1<id2) follows the
reference gold CSV format (/root/reference/cpp/sampler/sample.cc:122-141);
``gold_clusters`` maps conv_id -> entity_id.

Token frequencies are Zipf-distributed with a few planted hot tokens covering
a large fraction of turns, so blocking must handle skewed keys (FIXTURES F4).
"""

from __future__ import annotations

import json
import os
import re
import tempfile

import numpy as np
import pandas as pd

SEED = 42
FIXTURE_ROOT = "/tmp/ebsj_fixtures"
VOCAB_SIZE = 5000
HOT_TOKENS = ["the", "ok", "tool", "run"]
TOOLS = ["search", "browser", "calc", "files", "shell"]
SYNONYMS = {
    "start": "begin", "begin": "start", "stop": "halt", "halt": "stop",
    "big": "large", "large": "big", "fast": "quick", "quick": "fast",
    "error": "failure", "failure": "error", "result": "output", "output": "result",
}


def n_convs_for_sf(sf: float) -> int:
    return max(400, int(500_000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def _vocab() -> np.ndarray:
    words = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)], dtype=object)
    return words


def generate(n_convs: int, seed: int = SEED):
    """-> (transcripts_df, gold_pairs_df, gold_clusters_df), deterministic."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    zipf_w = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** 1.1
    zipf_w /= zipf_w.sum()

    convs = []  # (entity_id, conv_seq, [(turn_idx, role, text, tool)])
    entity_id = 0
    while sum(len(c[2]) >= 0 for c in convs) < n_convs and len(convs) < n_convs:
        n_variants = int(rng.choice([1, 1, 1, 2, 2, 3, 4, 6]))
        n_variants = min(n_variants, n_convs - len(convs))
        n_turns = int(np.clip(rng.zipf(1.4), 1, 64))
        # per-entity rare signature tokens: a real corpus grows vocabulary
        # (names, ids) with size, so the rarest tokens of near-duplicate
        # records coincide while unrelated records' rare tokens diverge —
        # the regime prefix-filter blocking exploits; a fixed shared vocab
        # would make every token's df grow linearly with corpus size and
        # degenerate blocking into an all-pairs join at scale
        sig = np.array([f"e{entity_id:07d}x{k}" for k in range(3)], dtype=object)
        base_turns = []
        for t in range(n_turns):
            role = ("user", "assistant", "tool")[t % 3]
            n_words = int(rng.integers(6, 24))
            words = list(rng.choice(vocab, size=n_words, p=zipf_w))
            # skew: hot tokens in ~40% of turns
            if rng.random() < 0.4:
                words.append(HOT_TOKENS[int(rng.integers(0, len(HOT_TOKENS)))])
            # long-tail vocabulary: every real transcript turn carries
            # specific identifiers (names, paths, ids) that near-duplicate
            # variants share but unrelated conversations don't — these df<=6
            # tokens are what prefix-filter blocking keys on in practice
            words.extend(f"e{entity_id:07d}t{t}r{k}" for k in range(3))
            words.extend(sig)
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
            base_turns.append((t, role, " ".join(words), tool))

        for v in range(n_variants):
            if v == 0:
                turns = list(base_turns)
            else:
                p_swap = float(rng.choice([0.0, 0.05, 0.12]))
                turns = []
                for (t, role, text, tool) in base_turns:
                    if len(base_turns) > 1 and rng.random() < 0.08:
                        continue  # turn drop
                    ws = text.split(" ")
                    out = []
                    for w in ws:
                        if rng.random() < p_swap:
                            if w in SYNONYMS and rng.random() < 0.5:
                                out.append(SYNONYMS[w])
                            else:
                                out.append(str(vocab[int(rng.integers(0, VOCAB_SIZE))]))
                        else:
                            out.append(w)
                    text2 = " ".join(out)
                    if rng.random() < 0.15:
                        text2 = text2.replace(" ", "  ", 1)  # whitespace noise
                    if rng.random() < 0.15:
                        text2 = text2 + ","
                    if not turns and not text2:
                        text2 = text
                    turns.append((t, role, text2, tool))
                if not turns:
                    turns = [base_turns[0]]
            convs.append((entity_id, len(convs), turns))
        entity_id += 1

    # assign conv ids by a seeded permutation so variants are not adjacent
    perm = rng.permutation(len(convs))
    base_ts = np.datetime64("2025-06-01T00:00:00", "us")
    rows_conv, rows_turn, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    gold_clusters = []
    eid_of = {}
    for (eid, seq, turns), cid_num in zip(convs, perm):
        cid = f"conv{cid_num:08d}"
        eid_of[cid] = eid
        gold_clusters.append((cid, eid))
        for (t, role, text, tool) in turns:
            rows_conv.append(cid)
            rows_turn.append(t)
            rows_role.append(role)
            rows_text.append(text)
            rows_tool.append(tool)
            rows_ts.append(base_ts + np.timedelta64(int(cid_num) * 3600 + t, "s"))

    tdf = pd.DataFrame(
        {
            "conv_id": pd.array(rows_conv, dtype="string[pyarrow]").astype(object),
            "turn_idx": np.array(rows_turn, dtype=np.int32),
            "role": rows_role,
            "text": rows_text,
            "tool": rows_tool,
            "ts": np.array(rows_ts, dtype="datetime64[us]"),
        }
    )
    # shuffle row order globally so canonicalization must restore turn order
    tdf = tdf.iloc[rng.permutation(len(tdf))].reset_index(drop=True)

    by_entity: dict[int, list[str]] = {}
    for cid, eid in gold_clusters:
        by_entity.setdefault(eid, []).append(cid)
    gp = []
    for eid, cids in sorted(by_entity.items()):
        cids = sorted(cids)
        for i in range(len(cids)):
            for j in range(i + 1, len(cids)):
                gp.append((cids[i], cids[j]))
    gold_pairs = pd.DataFrame(gp, columns=["id1", "id2"]).sort_values(["id1", "id2"]).reset_index(drop=True)
    gold_clusters_df = (
        pd.DataFrame(gold_clusters, columns=["conv_id", "entity_id"])
        .astype({"entity_id": np.int64})
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    return tdf, gold_pairs, gold_clusters_df


def fixture_dir_for(sf: float) -> str:
    return os.path.join(FIXTURE_ROOT, f"sf{sf:g}")


def ensure_fixture(sf_dir_or_sf) -> dict:
    """Idempotently materialize the transcript fixture for a testdata dir (or
    raw sf float); returns {'dir', 'transcripts', 'gold_pairs',
    'gold_clusters', 'n_convs'}.  Atomic write (tmp dir + rename) so
    concurrent callers are safe."""
    sf = sf_of_dir(sf_dir_or_sf) if isinstance(sf_dir_or_sf, str) else float(sf_dir_or_sf)
    d = fixture_dir_for(sf)
    meta_path = os.path.join(d, "meta.json")
    if not os.path.exists(meta_path):
        n = n_convs_for_sf(sf)
        tdf, gp, gc = generate(n)
        os.makedirs(FIXTURE_ROOT, exist_ok=True)
        tmp = tempfile.mkdtemp(dir=FIXTURE_ROOT)
        # write via pyarrow with schema metadata stripped: pandas' schema
        # metadata makes pyarrow Schemas unhashable, which defeats Ray Data's
        # schema dedup downstream (see sources/io.py:_strip_meta)
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        for name, frame in (("transcripts", tdf), ("gold_pairs", gp), ("gold_clusters", gc)):
            tbl = _pa.Table.from_pandas(frame, preserve_index=False)
            _pq.write_table(tbl.replace_schema_metadata(None), os.path.join(tmp, f"{name}.parquet"))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"sf": sf, "n_convs": int(n), "seed": SEED, "rows": int(len(tdf))}, f)
        try:
            os.rename(tmp, d)
        except OSError:
            if not os.path.exists(meta_path):
                raise
    with open(meta_path) as f:
        meta = json.load(f)
    return {
        "dir": d,
        "transcripts": os.path.join(d, "transcripts.parquet"),
        "gold_pairs": os.path.join(d, "gold_pairs.parquet"),
        "gold_clusters": os.path.join(d, "gold_clusters.parquet"),
        **meta,
    }
