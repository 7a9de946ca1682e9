"""Ray-version compatibility shims.

``suppress_empty_schema_warnings`` — Ray Data's streaming executor warns
(once per operator) when an operator emits a RefBundle whose schema differs
from the previous bundle's.  Three Ray-INTERNAL mechanisms produce
*schema-less* bundles that trip this even when every UDF returns typed
output (verified empirically against Ray 2.49; see
``ray/data/_internal/execution/streaming_executor_state.py``
``dedupe_schemas_with_validation``):

- a map task whose UDF outputs zero rows is flushed as a bundle with NO
  blocks (schema ``None``),
- ``groupby().map_groups`` wraps the UDF in a generator that yields nothing
  for an empty input block,
- ``Sort`` materializes empty range partitions as columnless blocks
  (``PandasBlockSchema(names=[], types=[])`` / empty Arrow schema).

In every such case the bundle carries zero rows and Ray resolves the
divergence by keeping the previous (typed) schema, so downstream operators
are unaffected — the warning is noise.  This filter drops ONLY the
empty-new-schema variant; a genuine conflict between two NON-empty schemas
still warns.
"""

from __future__ import annotations

import logging


def strip_pandas_metadata(t):
    """Drop schema-level metadata from an Arrow table.

    Ray converts a pandas block to Arrow with ``pa.Table.from_pandas``
    semantics, which attach a ``pandas`` metadata blob to the schema.
    ``pyarrow.Schema.__hash__`` raises on metadata-bearing schemas
    (``unhashable type: 'dict'``), so every sort/groupby over such blocks
    logs "Failed to hash the schemas (for deduplication)" per reduce task
    AND loses Ray's schema-dedup fast path — a small real cost.  Arrow
    stages that sit between a pandas-format stage and a shuffle call this
    on their output."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t

_MARK = "Operator produced a RefBundle with a different schema"
# str() of the three empty-schema spellings: None, empty pyarrow schema
# (prints as ""), empty pandas block schema
_EMPTY_NEW = (
    "new schema: None.",
    "new schema: .",
    "new schema: PandasBlockSchema(names=[], types=[]).",
)


class _EmptySchemaDivergenceFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if _MARK not in msg:
            return True
        return not any(e in msg for e in _EMPTY_NEW)


_installed = False


def suppress_empty_schema_warnings() -> None:
    """Idempotently install the filter on the emitting Ray logger."""
    global _installed
    if _installed:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaDivergenceFilter())
    _installed = True
