"""Coercion unit table (SURVEY.md §5.3): (type, raw) → (double, bool, string),
mirroring the reference's §1.2 semantics exactly — including the 0.0
string-parse fallback (Program.cs:397-405), bool=false for datetimes (:432),
and 1.0/0.0 for bools (:150)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opc2mongodb_spark.functions.coercion import (
    DOTNET_EPOCH_TICKS,
    coerce_value,
    coerce_value_dynamic,
    family_of,
)

# (declared type, raw string, expected double, expected bool, expected string)
CASES = [
    ("Boolean", "true", 1.0, True, "true"),
    ("Boolean", "false", 0.0, False, "false"),
    ("VT_BOOL", "true", 1.0, True, "true"),
    ("Double", "185.22", 185.22, True, "185.22"),
    ("Float", "0", 0.0, False, "0.0"),
    ("Int64", "42", 42.0, True, "42.0"),
    ("VT_I4", "-7", -7.0, True, "-7.0"),
    ("String", "abc", 0.0, False, "abc"),  # parse failure → 0.0 (Program.cs:397-405)
    ("String", "1e3", 1000.0, True, "1e3"),
    ("String", "42.5", 42.5, True, "42.5"),
    ("LocalizedText", "", 0.0, False, ""),
    # datetime → .NET ticks; bool always false (Program.cs:431-432)
    (
        "DateTime",
        "2024-01-01 00:00:00",
        float(1704067200 * 10_000_000 + DOTNET_EPOCH_TICKS),
        False,
        "2024-01-01 00:00:00",
    ),
]


@pytest.mark.parametrize("dtype,raw,exp_d,exp_b,exp_s", CASES)
def test_coerce_value(spark, dtype, raw, exp_d, exp_b, exp_s):
    df = spark.createDataFrame([(raw,)], "raw string").select(
        coerce_value(F.col("raw"), dtype).alias("v")
    )
    row = df.select("v.doubleValue", "v.boolValue", "v.stringValue").first()
    assert row[0] == pytest.approx(exp_d), f"{dtype}({raw!r}) double"
    assert row[1] == exp_b, f"{dtype}({raw!r}) bool"
    assert row[2] == exp_s, f"{dtype}({raw!r}) string"


@pytest.mark.parametrize("dtype,raw,exp_d,exp_b,exp_s", CASES)
def test_coerce_value_dynamic_matches_static(spark, dtype, raw, exp_d, exp_b, exp_s):
    df = spark.createDataFrame([(raw, dtype)], "raw string, dt string").select(
        coerce_value_dynamic(F.col("raw"), F.col("dt")).alias("v")
    )
    row = df.select("v.doubleValue", "v.boolValue", "v.stringValue").first()
    assert row[0] == pytest.approx(exp_d)
    assert row[1] == exp_b
    assert row[2] == exp_s


def test_unsupported_type_raises():
    with pytest.raises(KeyError):
        coerce_value(F.col("x"), "FunkyType")


def test_unsupported_type_dynamic_nulls(spark):
    df = spark.createDataFrame([("1.0", "FunkyType")], "raw string, dt string")
    out = df.select(coerce_value_dynamic(F.col("raw"), F.col("dt")).alias("v"))
    assert out.first()["v"] is None  # → dropped by raw_to_opc_values


def test_family_aliases_cover_reference_matrix():
    # every alias family from Program.cs:137-443 / :765-949 resolves
    for t in ["bool", "Boolean", "system.boolean", "float", "single", "double",
              "decimal", "byte", "sbyte", "int16", "uint16", "int32", "integer",
              "uint32", "statuscode", "int64", "uint64", "string",
              "expandednodeid", "guid", "nodeid", "qualifiedname",
              "localizedtext", "xmlelement", "time", "date", "datetime",
              "vt_bool", "vt_r4", "vt_r8", "vt_i1", "vt_i2", "vt_i4", "state",
              "vt_bstr", "vt_date"]:
        assert family_of(t) is not None, t
    assert family_of("blob") is None
