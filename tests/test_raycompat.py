"""raycompat: the empty-schema divergence filter drops only the benign case."""

import logging

from entityblockingbysimilarityjoins_ray.raycompat import _EmptySchemaDivergenceFilter


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord("ray.data._internal.execution.streaming_executor_state",
                             logging.WARNING, __file__, 1, msg, (), None)


def test_filter_drops_empty_new_schema():
    f = _EmptySchemaDivergenceFilter()
    base = ("Operator produced a RefBundle with a different schema than the "
            "previous one. Previous schema: id: string, ")
    assert not f.filter(_rec(base + "new schema: None. This may lead to unexpected behavior."))
    assert not f.filter(_rec(base + "new schema: . This may lead to unexpected behavior."))
    assert not f.filter(_rec(
        base + "new schema: PandasBlockSchema(names=[], types=[]). This may lead to unexpected behavior."))


def test_filter_keeps_real_divergence_and_other_messages():
    f = _EmptySchemaDivergenceFilter()
    assert f.filter(_rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: id: string, new schema: id: int64. "
        "This may lead to unexpected behavior."))
    assert f.filter(_rec("some other warning entirely"))
