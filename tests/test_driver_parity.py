"""Driver-parity smoke: every registry query must ANALYZE under a vanilla
SparkSession (no nanosAsLong, no pinned timezone, default shuffle
partitions) — the session shape the round driver actually uses.

Round-3 lesson: the repo's tuned ``get_spark`` masked a testdata dtype
change (events ``ts`` became TIMESTAMP_NTZ) that threw AnalysisException
for 8 queries at the driver while every local check stayed green. Touching
``.schema`` forces full analysis (resolution + type checking) without
executing the plan, so this covers the whole 103-query surface in minutes;
queries that execute driver-side work inside their builder (streaming
replays, codebook training) run that work too — at sf0.001 that is cheap.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import TESTDATA

SF_DIR = os.path.join(TESTDATA, "sf0.001")

# Session confs the tuned fixture (or any previously-run harness query)
# may have set on the shared context — reset to driver defaults.
_DRIVER_DEFAULTS = {
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.session.timeZone": None,  # None → unset (JVM default tz)
}


@pytest.fixture(scope="module")
def vanilla(spark):
    """A driver-like session sharing the test JVM: ``newSession`` gives a
    fresh SQLConf; explicitly reset the confs our tuned fixture pins."""
    s = spark.newSession()
    for k, v in _DRIVER_DEFAULTS.items():
        if v is None:
            s.conf.unset(k)
        else:
            s.conf.set(k, v)
    return s


def _query_names():
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_analyzes_under_vanilla_session(vanilla, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    df = fn(vanilla, SF_DIR)
    # .schema forces analysis (resolution + type check), not execution
    assert len(df.schema.fields) > 0


def test_every_registered_query_is_reexported():
    """harness/ split guard: every QUERIES entry must be importable as an
    attribute of the package (tools/dump_plans and tests import by name;
    a query added to a family module but not __init__ would silently
    register yet break those imports)."""
    import whatsapp_vectordb_spark.harness as h

    missing = [n for n, fn in h.QUERIES.items() if not hasattr(h, fn.__name__)]
    assert not missing, missing


def test_register_rejects_duplicate_names():
    """VERDICT r14 #3: a second registration under an existing name must
    fail loudly — a silent overwrite shrinks the registry invisibly and
    the sweep's --check parity audits the post-collision registry, so
    nothing downstream can detect the loss."""
    import whatsapp_vectordb_spark.harness as h
    from whatsapp_vectordb_spark.harness._core import _register

    existing = next(iter(h.QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):

        @_register(existing)
        def shadow(spark, sf_dir):  # pragma: no cover - must not register
            raise AssertionError

    # the original registration is untouched
    assert h.QUERIES[existing].__name__ != "shadow"
