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

    @property
    def name(self) -> str:
        tokpart = f"{self.tok}{self.q}" if self.tok == "qgm" else self.tok
        return f"{self.attr}_{self.sim}_{tokpart}_{self.threshold:g}"


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
