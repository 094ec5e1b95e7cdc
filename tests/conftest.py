from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The oracle sweep runs at BOTH gate SFs by default (CLAUDE.md rule: verify
# at sf0.001 AND sf0.01 — the driver's correctness gate runs at sf0.01, and
# round 1 shipped failures precisely because the committed gate only covered
# the smaller SF). Setting SPARK_GRAFT_TEST_SF_DIR narrows the sweep to that
# one directory for quick iteration.
if "SPARK_GRAFT_TEST_SF_DIR" in os.environ:
    ORACLE_SF_DIRS = [SF_DIR]
else:
    ORACLE_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.fixture(scope="session")
def spark():
    from opc2mongodb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(app_name="tests", master=f"local[{cpus}]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_provider(request, spark):
    """Run a stateful-streaming golden under BOTH state-store providers
    (r9 VERDICT #6 follow-through): the default in-heap HDFS-backed store
    and the RocksDB provider a 100 TB key space deploys on. State
    semantics, restart recovery, and timeout firing must be identical
    across them, so every applyInPandasWithState golden that takes this
    fixture runs twice. The conf is read at .start(), so setting it on the
    shared session only affects queries the test itself starts."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    if request.param == "rocksdb":
        from opc2mongodb_spark.session import ROCKSDB_PROVIDER

        spark.conf.set(key, ROCKSDB_PROVIDER)
    else:
        # the 'hdfs' leg must PIN the default provider, not inherit the
        # session value — a SPARK_GRAFT_STATE_STORE=rocksdb session or a
        # leaked conf would otherwise silently run BOTH legs on RocksDB
        # and collapse the provider matrix to one provider (r10 ADVICE)
        spark.conf.unset(key)
    yield request.param
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


@pytest.fixture(scope="session", params=ORACLE_SF_DIRS,
                ids=[os.path.basename(p) for p in ORACLE_SF_DIRS])
def oracle_sf_dir(request) -> str:
    return request.param
