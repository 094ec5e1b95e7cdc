"""Oracle-checked query inventory (SURVEY.md §2.2, the binding matrix).

Every entry pairs a PySpark DataFrame builder with an ANSI-SQL twin that
DuckDB runs on the same parquet tables. The driver compares row-count +
schema + order-insensitive value-hash, so each query follows strict
cross-engine determinism rules:

- float aggregates go through DECIMAL so summation order cannot change the
  result (map-side partial aggregation in Spark is order-nondeterministic),
  but the FINAL output column is cast to DOUBLE on BOTH sides — a DECIMAL
  in the final schema renders asymmetrically under the driver's hasher
  (Decimal('153578.00') vs 153578.0) and oracle.compare_query rejects it;
- every computed column is aliased identically on both sides;
- ranking/limit queries carry a unique tiebreaker in the ORDER BY;
- int-width functions (year, length, rank, floor, ceil, ...) are cast to a
  common type on both sides;
- a bare double->integer CAST diverges: Spark truncates toward zero,
  DuckDB rounds to nearest (measured: q_round_number_bias cents guard,
  195 vs 210 rows at sf0.001) — integerize doubles with an explicit
  floor()/DIV on BOTH sides, never a bare CAST;
- %.9e is NOT safe for quantities that can land dyadic-exact (integer /
  power-of-two divisions, e.g. a mean over a 64-element frame): the 10th
  significant digit is then an exact decimal tie, and Java format_string
  rounds half-UP while C printf rounds half-EVEN (measured: q_bot_regularity
  3.767114063e4 vs ...062e4). Reserve %.9e for generically-irrational
  results (post-sqrt/ln/exp); render rational statistics as scaled
  integers (DIV / floor(x * 1e9)) instead.

The Spark side is written the way you'd write it for 100 TB: broadcast hints
on small dims, partial-aggregable expressions, no Python UDFs, no collect.

Builder ``persist()`` notes: a handful of builders persist a small frame
consumed by 2+ downstream branches (decile edge arrays, tiny joint/count
tables, one distinct edge list). Builders return LAZY plans, so there is no
post-action hook to unpersist — this is deliberate and bounded: Spark's
CacheManager dedupes persists by logical plan, so repeated builds of the
same query reuse one cache entry, and the total cached state is one small
entry per persist SITE (grep count, single digits), not per build call.
"""


from __future__ import annotations

from opc2mongodb_spark.queries._core import (QuerySpec, REGISTRY, register, _t, dec, sci9, _flip_sql)

# registration side effects — import order preserves the original
# single-file top-to-bottom registration order
from opc2mongodb_spark.queries import relational  # noqa: E402,F401
from opc2mongodb_spark.queries import widening  # noqa: E402,F401
from opc2mongodb_spark.queries import tpch_events  # noqa: E402,F401
from opc2mongodb_spark.queries import layout_quality  # noqa: E402,F401
from opc2mongodb_spark.queries import privacy_drift  # noqa: E402,F401
from opc2mongodb_spark.queries import telemetry_linalg  # noqa: E402,F401
from opc2mongodb_spark.queries import ml_eval  # noqa: E402,F401
from opc2mongodb_spark.queries import recsys_windows  # noqa: E402,F401
from opc2mongodb_spark.queries import timeseries_experiments  # noqa: E402,F401
from opc2mongodb_spark.queries import corpus_econ  # noqa: E402,F401
from opc2mongodb_spark.queries import stat_tests  # noqa: E402,F401

__all__ = ["QuerySpec", "REGISTRY", "register", "_t", "dec", "sci9"]
