"""pymongo wire adapter for MongoBulkUpsertSink (r7 VERDICT #4).

No MongoDB (or pymongo) exists in this sandbox, so the contract is proven
two ways against the existing injectable-fake harness:

1. request-set parity — the SAME micro-batch driven through (a) the spool
   fake and (b) the pymongo adapter over an injected fake ``pymongo``
   module must build IDENTICAL request sets: one
   ``ReplaceOne({'tag': key}, doc, upsert=True)`` per changed key, one
   unordered ``bulk_write`` per collection (the reference's per-record
   awaited RPC — OPC2MongoDB/Program.cs:1179-1182 — collapsed to bulk);
2. import guard — constructing ``PymongoClientFactory`` is always safe;
   calling it without pymongo raises ImportError (the ``delta_available``
   pattern).
"""

from __future__ import annotations

import datetime
import functools
import json
import sys
import types

import pytest

from opc2mongodb_spark.streaming.sinks import (
    MongoBulkUpsertSink,
    PymongoBulkClient,
    PymongoClientFactory,
    pymongo_available,
)


class _FakeReplaceOne:
    def __init__(self, flt, replacement, upsert=False):
        self.filter = flt
        self.replacement = replacement
        self.upsert = upsert


class _FakeCollection:
    def __init__(self, name, calls):
        self._name = name
        self._calls = calls

    def bulk_write(self, requests, ordered=True):
        self._calls.append((self._name, list(requests), ordered))


class _FakeDatabase:
    def __init__(self, calls):
        self._calls = calls

    def __getitem__(self, collection):
        return _FakeCollection(collection, self._calls)


class _FakeMongoClient:
    def __init__(self):
        self.closed = False

    def close(self):
        self.closed = True


@pytest.fixture
def fake_pymongo(monkeypatch):
    """Inject a minimal fake ``pymongo`` module so the adapter's in-method
    ``from pymongo import ReplaceOne`` resolves driver-side."""
    mod = types.ModuleType("pymongo")
    mod.ReplaceOne = _FakeReplaceOne
    monkeypatch.setitem(sys.modules, "pymongo", mod)
    return mod


def _spool_ops(spool):
    import os

    out = []
    if not os.path.exists(spool):
        return out
    for fn in sorted(os.listdir(spool)):
        with open(os.path.join(spool, fn)) as f:
            out.extend(json.loads(line) for line in f)
    return out


def test_pymongo_adapter_builds_identical_request_set(
    spark, tmp_path, fake_pymongo
):
    """Drive one micro-batch through the spool fake (the tested-good
    harness), then replay the spooled (collection, key, doc_json) ops
    through the pymongo adapter over a recording fake client: the
    ReplaceOne set must match the spool set exactly — same keys, same
    replacement documents, upsert=True, unordered bulk per collection."""
    from pyspark.sql import types as T

    class _SpoolClient:
        def __init__(self, spool_dir):
            self.spool_dir = spool_dir
            self.raw_ops = []

        def bulk_replace(self, collection, ops):
            import os
            import uuid

            os.makedirs(self.spool_dir, exist_ok=True)
            fn = f"{uuid.uuid4().hex}.jsonl"
            with open(os.path.join(self.spool_dir, fn), "w") as f:
                for key, doc_json in ops:
                    f.write(
                        json.dumps(
                            {
                                "collection": collection,
                                "key": key,
                                "doc_json": doc_json,
                            }
                        )
                        + "\n"
                    )

        def close(self):
            pass

    spool = str(tmp_path / "spool")
    sink = MongoBulkUpsertSink(functools.partial(_SpoolClient, spool))

    def ts(s):
        return datetime.datetime(2024, 1, 1, 10, 0, s)

    schema = T.StructType(
        [
            T.StructField("server", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("dataType", T.StringType()),
            T.StructField("doubleValue", T.DoubleType()),
            T.StructField("boolValue", T.BooleanType()),
            T.StructField("stringValue", T.StringType()),
            T.StructField("sourceTimestamp", T.TimestampType()),
            T.StructField("serverTimestamp", T.TimestampType()),
            T.StructField("quality", T.IntegerType()),
        ]
    )
    batch = spark.createDataFrame(
        [
            ("A", "t1", "double", 1.0, None, None, ts(0), ts(0), 192),
            ("A", "t1", "double", 2.0, None, None, ts(5), ts(5), 192),
            ("A", "t2", "double", 7.0, None, None, ts(1), ts(1), 192),
            ("B", "t3", "double", 9.0, None, None, ts(2), ts(2), 192),
        ],
        schema,
    )
    sink.foreach_batch(batch, 0)
    spooled = _spool_ops(spool)
    assert len(spooled) == 3  # latest per key only

    # Replay the exact spooled ops through the pymongo adapter.
    calls = []
    adapter = PymongoBulkClient(_FakeMongoClient(), _FakeDatabase(calls))
    by_collection: dict[str, list] = {}
    for op in spooled:
        by_collection.setdefault(op["collection"], []).append(
            (op["key"], op["doc_json"])
        )
    for collection, ops in sorted(by_collection.items()):
        adapter.bulk_replace(collection, ops)

    got = set()
    for collection, requests, ordered in calls:
        assert ordered is False  # one unordered bulk per collection
        for r in requests:
            assert isinstance(r, _FakeReplaceOne) and r.upsert is True
            got.add(
                (collection, r.filter["tag"], json.dumps(r.replacement, sort_keys=True))
            )
    want = {
        (
            op["collection"],
            op["key"],
            json.dumps(json.loads(op["doc_json"]), sort_keys=True),
        )
        for op in spooled
    }
    assert got == want
    # filter key IS the document's tag field (the reference's upsert key)
    for collection, requests, _ in calls:
        for r in requests:
            assert r.filter == {"tag": r.replacement["tag"]}


def test_pymongo_adapter_empty_ops_no_rpc(fake_pymongo):
    calls = []
    adapter = PymongoBulkClient(_FakeMongoClient(), _FakeDatabase(calls))
    adapter.bulk_replace("A", [])
    assert calls == []


def test_pymongo_adapter_close_closes_client(fake_pymongo):
    client = _FakeMongoClient()
    adapter = PymongoBulkClient(client, _FakeDatabase([]))
    adapter.close()
    assert client.closed


def test_pymongo_factory_import_guard():
    if pymongo_available():
        pytest.skip("pymongo installed — real path exercised elsewhere")
    factory = PymongoClientFactory("mongodb://127.0.0.1:27017/opc2mongodb")
    with pytest.raises(ImportError, match="fake client factory"):
        factory()


def test_pymongo_factory_is_picklable():
    """The factory ships to executors inside foreachPartition — it must
    pickle with plain-string state only."""
    import pickle

    f = PymongoClientFactory("mongodb://h:27017/db", database="override")
    g = pickle.loads(pickle.dumps(f))
    assert g.mongo_url == f.mongo_url and g.database == "override"
