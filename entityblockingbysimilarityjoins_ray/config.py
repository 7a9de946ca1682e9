"""Pipeline / rule configuration objects.

Mirrors the reference's ``Rule`` struct (/root/reference/cpp/common/dataframe.h:93-107:
``{attr, sim, sim_measure, tok, tok_settings, sign, threshold}``) and the
``rules.txt`` grammar ``attr_attr_sim_tok`` parsed in
/root/reference/simjoin_entitymatching/blocker/graph.py:296-302 — but as plain
Python dataclasses handed to the Ray pipeline builder instead of a file format.
"""

from __future__ import annotations

from dataclasses import dataclass, field


#: delimiter set of the reference's Dlm tokenizer
#: (/root/reference/cpp/common/tokenizer.cc:268: ``" \"',\\\t\r\n"``)
DLM_DELIMS = " \"',\\\t\r\n"

SIM_FUNCS = ("jac", "cos", "dice", "overlap", "lev", "exm", "anm")
#: alias sim names appearing in real reference feature files (graph.py
#: sort_ranges2 builds 'lev_'+{sim,dist}; py_entitymatching uses long names)
SIM_ALIASES = {
    "jaccard": "jac",
    "cosine": "cos",
    "exact": "exm",
    "abs": "anm",
    "lev_sim": "lev",
    "lev_dist": "lev",
}
TOKENIZERS = ("dlm", "qgm", "wspace", "alphanumeric", "none")


@dataclass(frozen=True)
class BlockingRule:
    """One blocking predicate, e.g. jac(dlm(doc)) >= 0.7.

    sim dispatch mirrors the reference blocker
    (/root/reference/cpp/blocker/simjoin_blocker.cc:8-177):
    jac/cos/dice -> set-similarity join, overlap -> overlap join,
    lev -> edit-distance join, exm -> exact join, anm -> numeric join.
    """

    attr: str = "doc"
    sim: str = "jac"
    tok: str = "dlm"  # ignored for lev/exm/anm
    q: int = 3  # only for tok == "qgm"
    threshold: float = 0.7  # delta for set sims, D for lev (int), t for anm
    sign: str = "+"  # reserved; reference supports +/- rules
    #: lev threshold domain: 'dist' = integer edit distance (PassJoin D),
    #: 'sim' = normalized similarity 1 - d/max(|a|,|b|) in (0, 1] — the
    #: feature-domain lev a reference lev_sim rule thresholds
    lev_metric: str = "dist"

    @property
    def name(self) -> str:
        tokpart = f"{self.tok}{self.q}" if self.tok == "qgm" else self.tok
        simpart = ("levsim" if self.sim == "lev" and self.lev_metric == "sim"
                   else self.sim)
        return f"{self.attr}_{simpart}_{tokpart}_{self.threshold:g}"


def rule_from_feature_name(feature_name: str, threshold: float,
                           sign: str = "+") -> BlockingRule:
    """Parse one reference feature name ``attr_attr_sim_tok[_dcN]`` (e.g.
    ``title_title_jac_dlm_dc0``) into a BlockingRule — the grammar of
    /root/reference/simjoin_entitymatching/blocker/graph.py:296-302.
    Single-attr forms ``attr_sim_tok`` and ``attr_exm``/``attr_anm``/
    ``attr_lev`` are accepted too."""
    parts = feature_name.split("_")
    # strip trailing tokenizer-setting suffix like dc0
    if parts and parts[-1].startswith("dc") and parts[-1][2:].isdigit():
        parts = parts[:-1]
    q = 3
    tok = "none"
    if parts and (parts[-1] in TOKENIZERS or parts[-1].startswith("qgm")):
        t = parts.pop()
        if t.startswith("qgm"):
            tok = "qgm"
            if t[3:].isdigit():
                q = int(t[3:])
        else:
            tok = t
    # two-segment lev forms (lev_sim / lev_dist, graph.py sort_ranges2)
    # first.  lev_sim thresholds a NORMALIZED similarity — carrying it into
    # a distance-domain rule would silently collapse blocking to
    # exact-match (int(0.78) == 0), so the metric travels on the rule
    lev_metric = "dist"
    if len(parts) >= 2 and "_".join(parts[-2:]) in SIM_ALIASES:
        two = "_".join(parts[-2:])
        sim = SIM_ALIASES[two]
        if two == "lev_sim":
            lev_metric = "sim"
        parts = parts[:-2]
    elif parts and parts[-1] in SIM_ALIASES:
        sim = SIM_ALIASES[parts.pop()]
    elif parts and parts[-1] in SIM_FUNCS:
        sim = parts.pop()
    else:
        raise ValueError(f"cannot parse feature name {feature_name!r}")
    # duplicated attr (Megallen ltable/rtable naming) collapses to one —
    # attrs may themselves contain underscores (n_turns_n_turns_anm), so
    # compare the two HALVES of the remaining segments, not single tokens
    if len(parts) >= 2 and len(parts) % 2 == 0 and \
            parts[: len(parts) // 2] == parts[len(parts) // 2:]:
        parts = parts[: len(parts) // 2]
    attr = "_".join(parts)
    if not attr:
        raise ValueError(f"no attribute in feature name {feature_name!r}")
    return BlockingRule(attr=attr, sim=sim, tok=tok, q=q,
                        threshold=threshold, sign=sign, lev_metric=lev_metric)


def rules_from_text(text: str) -> list[BlockingRule]:
    """Parse a reference ``rules.txt``: first line = rule count, then one
    ``feature_name sign threshold`` line per rule
    (/root/reference/simjoin_entitymatching/blocker/extract_formula.py:6-14,
    read by RuleReader::readRules /root/reference/cpp/common/io.h:93)."""
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if not lines:
        return []
    try:
        n = int(lines[0])
        body = lines[1:1 + n]
    except ValueError:  # headerless variant: every line is a rule
        body = lines
    rules = []
    for ln in body:
        fields = ln.split()
        if len(fields) != 3:
            raise ValueError(f"bad rule line {ln!r} (want 'name sign threshold')")
        name, sign, thr = fields
        rules.append(rule_from_feature_name(name, float(thr), sign))
    return rules


def rules_from_file(path: str) -> list[BlockingRule]:
    with open(path) as f:
        return rules_from_text(f.read())


@dataclass
class PipelineConfig:
    """Knobs for the end-to-end ER pipeline.

    Scale-relevant knobs are explicit so the same code runs on a laptop and a
    multi-node cluster; defaults are sized for the local 32-cpu sandbox.
    """

    # --- canonicalization ---
    num_buckets: int = 64  # hash-bucket fanout for groupby-bucket stages
    doc_sep: str = "\n"  # join separator for per-conversation doc

    # --- blocking ---
    rules: list[BlockingRule] = field(
        default_factory=lambda: [BlockingRule(attr="doc", sim="jac", tok="dlm", threshold=0.5)]
    )
    pair_partitions: int = 64  # hash-bucket fanout for pair-level stages
    salt_df_threshold: int = 1000  # tokens hotter than this get triangle salting
    salt_factor: int = 8  # number of salt shards for hot tokens
    max_group_size: int | None = None  # cap on records per blocking key (None = exact)
    broadcast_limit: int = 2_000_000  # max records for broadcast verify (else Dataset.join)
    broadcast_bytes_limit: int = 4 << 30  # max estimated bytes for any broadcast state
    include_empty_pairs: bool = True  # jaccard(empty, empty) == 1.0 (simfunc.cc:129-130)
    # beyond-broadcast verify: token index written as Parquet shards (shard =
    # hash(id) % S); pairs shuffle ONCE to (shard(k1), shard(k2)) grid cells
    # and each cell reads just its two shards.  None -> ~sqrt(pair_partitions)
    # so grid cells ~ pair_partitions; at real scale set so one shard
    # (index_bytes / S) fits a worker's heap alongside a pair batch.
    verify_shards: int | None = None
    shard_store_dir: str | None = None  # scratch root (None -> tempdir; cluster storage at scale)

    # --- matching ---
    match_threshold: float = 0.6
    topk: int | None = None  # output-size cap after rule union (block_main.cc:79-118)
    topk_trigger: int | None = None  # apply topk only above this pair count (pretopKviaTASelf MAX_TOTAL_SIZE)

    # --- clustering ---
    cc_max_iters: int = 50
    cc_driver_limit: int = 2_000_000  # below this many edges use driver-side DSU

    # --- checkpointing ---
    checkpoint_dir: str | None = None
    resume: bool = True
