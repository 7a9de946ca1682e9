"""Ray-Data-native entity-blocking / record-linkage engine.

A from-scratch rebuild of the data-processing capabilities of
rutgers-db/EntityBlockingBySimilarityJoins (similarity-join blocking ->
pairwise feature scoring -> match decision -> transitive entity clustering)
over Parquet tables of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Architecture (idiomatic Ray Data, NOT a port of the reference's OpenMP/C++
engine):

- every stage is a lazy ``ray.data.Dataset`` transform; blocks are Arrow;
  hot kernels are numpy / pyarrow.compute / pandas vectorized,
- tokens are represented as deterministic 64-bit hashes
  (``pd.util.hash_array``) so no global token dictionary is required for
  identity; a small broadcast document-frequency table (df>=2 tokens only)
  drives prefix ordering, widow-dropping and IDF weights,
- blocking joins are expressed as signature ``map_batches`` -> hash-bucket
  ``groupby`` -> vectorized within-bucket pair generation (triangle salting
  for hot keys),
- pair verification fetches token sets via ``Dataset.join`` (or a broadcast
  lookup for small sides) and computes exact similarities with a vectorized
  merge-intersect kernel,
- entity clustering is distributed connected components (alternating
  large-star / small-star min-label contraction).

Reference parity claims cite ``/root/reference`` file:line in docstrings.
"""

__version__ = "0.1.0"

from .config import BlockingRule, PipelineConfig  # noqa: F401
