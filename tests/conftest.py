from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

# Per-process oracle-scratch isolation (VERDICT r8 #3): persisted oracle
# state defaults to a fixed repo-relative path keyed by query name only, so
# a pytest run racing a concurrent check_correctness/sweep process on the
# same box can corrupt each other's parquet mid-read (observed:
# UNABLE_TO_INFER_SCHEMA on a half-overwritten directory). Point this
# process tree at its own tmp root BEFORE any harness module bakes paths
# into oracle SQL at import time. Respects an explicit caller override.
if "SPARK_GRAFT_ORACLE_SCRATCH" not in os.environ:
    _scratch = tempfile.mkdtemp(prefix="wvs-scratch-pytest-")
    os.environ["SPARK_GRAFT_ORACLE_SCRATCH"] = _scratch
    atexit.register(shutil.rmtree, _scratch, ignore_errors=True)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def spark():
    from whatsapp_vectordb_spark.session import get_spark

    s = get_spark(app_name="wvs-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
