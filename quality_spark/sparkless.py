"""Row-at-a-time / small-batch rule evaluation outside a cluster — the
engine's answer to the reference's "sparkless" processors
(sparkless/Processor.scala:13-42, sparkless/ProcessFunctions.scala:57-491),
which compile rule suites to run in plain JVM services with no Spark
context.

A PySpark engine cannot drop the Spark runtime entirely (rule text IS
Spark SQL), so the nearest idiom is compiling the suite ONCE against a
declared schema and evaluating incoming batches through a reusable
local plan:

* the suite compiles to encoded per-rule SQL a single time
  (``RowProcessor.__init__``), not per batch;
* ``process`` ships a batch through Arrow into a local-relation plan —
  no shuffle, no job scheduling beyond one collect;
* throughput intent mirrors the reference's MutableProjection path:
  amortize compile, stream rows.

For genuinely Spark-free scoring, export the suite with
``to_rule_suite_df``/docs and evaluate the (ANSI) SQL rules in the
service's own engine — the expressions are plain SQL by design.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Union

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .model import RuleSuite
from .operators.runner import rule_runner

__all__ = ["RowProcessor", "DuckDBProcessor", "dq_factory"]


def _parse_scalar_ddl(schema: str) -> list:
    """[(name, normalized_type)] from a Spark-style scalar DDL string
    ("x double, s string", optional ``name: type`` colon form,
    backtick-quoted names with spaces, ``decimal(p,s)`` kept
    verbatim). No SparkSession required. Non-scalar types parse into a
    type token the caller rejects with a clear error."""
    fields, depth, cur = [], 0, ""
    for ch in schema:
        if ch == "," and depth == 0:
            fields.append(cur)
            cur = ""
        else:
            depth += ch in "(<"
            depth -= ch in ")>"
            cur += ch
    fields.append(cur)
    out = []
    for f in fields:
        f = f.strip()
        if not f:
            continue
        if f.startswith("`"):
            end = f.find("`", 1)
            if end < 0:
                raise ValueError(f"unterminated backtick in DDL field {f!r}")
            name, rest = f[1:end], f[end + 1 :].lstrip()
            rest = rest[1:] if rest.startswith(":") else rest
        else:
            # name ends at the first colon or whitespace OUTSIDE any
            # bracket (a struct<a:int> colon must not split the field)
            cut = next(
                (i for i, ch in enumerate(f) if ch in ": \t" ), None
            )
            if cut is None:
                raise ValueError(f"cannot parse DDL field {f!r}")
            name, rest = f[:cut], f[cut + 1 :]
        typ = rest.strip().lower().replace(" ", "")
        if not name or not typ:
            raise ValueError(f"cannot parse DDL field {f!r}")
        out.append((name, typ))
    return out


class RowProcessor:
    """Reusable evaluator: ``process(rows) -> [Row(...input, DQ=...)]``."""

    def __init__(
        self,
        spark: SparkSession,
        suite: RuleSuite,
        schema: Union[str, T.StructType],
        name: str = "DQ",
    ) -> None:
        self.spark = spark
        self.schema = (
            T._parse_datatype_string(schema) if isinstance(schema, str) else schema
        )
        self.name = name
        probe = spark.createDataFrame([], self.schema)
        # compile once; rule_runner's type probing happens here, not per batch
        self._runner = rule_runner(suite, probe)

    def process(self, rows: Iterable[Union[Mapping, Sequence]]) -> List[Row]:
        batch = self.spark.createDataFrame(list(rows), self.schema)
        return batch.select("*", self._runner.alias(self.name)).collect()

    def process_one(self, row: Union[Mapping, Sequence]) -> Row:
        return self.process([row])[0]


def dq_factory(
    spark: SparkSession, suite: RuleSuite, schema: Union[str, T.StructType]
) -> RowProcessor:
    """Factory naming matches the reference entry point
    (sparkless/ProcessFunctions.scala:57)."""
    return RowProcessor(spark, suite, schema)


class DuckDBProcessor:
    """TRULY Spark-free rule evaluation: the suite compiles once to
    DuckDB SQL and batches score through DuckDB's vectorized engine —
    no JVM, no SparkSession, embeddable in any Python service. This is
    the closest Python analogue of the reference's sparkless
    MutableProjection path (sparkless/Processor.scala:13-42): compile
    once, stream batches, same integer result encoding and overall
    folds (results.py mirrors impl/OverallResult.scala:21-30).

    Scope: the dialect-portable subset of rule SQL (comparisons,
    arithmetic, CASE, IN, string/math functions, expanded lambdas).
    Rules using Spark-only functions fail at COMPILE time with the
    offending rule named — same contract as the reference's sparkless,
    which also rejects non-compilable expressions.

    Throughput: DuckDB parallelizes per ~122k-row morsel, so batches
    below that run single-threaded — feed LARGE batches for service
    throughput (measured: 780 generated rules score 0.31 ms/row on a
    10k batch but 0.059 ms/row on a 600k batch, vs the reference
    MutableProjection's published 0.1 ms/row —
    ProcessorThroughputBenchmark.scala:26; numbers in SCALE.md).
    Per-call overhead (register + view + parse) is ~1 ms, negligible
    beyond ~10k rows.
    """

    def __init__(
        self,
        suite: RuleSuite,
        sample_row: Optional[Mapping] = None,
        schema: Optional[str] = None,
    ) -> None:
        """``schema`` (a Spark DDL string, e.g. "x double, s string")
        is the robust way to declare input types; ``sample_row`` probes
        from one concrete row and REQUIRES every value non-null — a
        None value would make DuckDB infer the wrong column type and
        silently select the wrong result encoding."""
        import duckdb

        from .plans.compiler import RuleCompilationError, expand_rules
        from .results import encode_rule_sql_duck, overall_result_sql
        from .model import pack_id

        self.suite = suite
        self._con = duckdb.connect()
        # our macro expansion emits Spark typed numeric literals
        # (0.0D / 42L); strip the suffix for DuckDB — it only follows a
        # numeric literal, never an identifier (those can't start with
        # a digit). String literals containing such sequences are out
        # of sparkless scope (documented).
        import re

        def _portable(sql: str) -> str:
            # every Spark typed-literal suffix, case-insensitively:
            # D/L/F/S/Y plus BD (decimal) — lowercase 0.0d / 42l / 2s /
            # 3y are legal Spark SQL and must not leak into DuckDB text
            # (S/Y matches expr._NUM_RE's tokenizer; ADVICE r04 low)
            suf = r"(?:BD|[DLFSY])"
            sql = re.sub(
                rf"\b(\d+(?:\.\d+)?(?:[eE][+-]?\d+)?){suf}\b",
                r"\1", sql, flags=re.IGNORECASE,
            )
            return re.sub(
                rf"(\d*\.\d+(?:[eE][+-]?\d+)?){suf}\b",
                r"\1", sql, flags=re.IGNORECASE,
            )

        expanded = [
            (rs, r, _portable(sql)) for rs, r, sql in expand_rules(suite)
        ]

        # type-probe against a schema-shaped empty relation (LIMIT 0 —
        # analysis only, mirrors runner.probe_types)
        if (sample_row is None) == (schema is None):
            raise ValueError(
                "pass exactly one of sample_row (all values non-null) "
                "or schema (Spark DDL string)"
            )
        if schema is not None:
            _DUCK = {
                "boolean": "BOOLEAN", "byte": "TINYINT", "tinyint": "TINYINT",
                "short": "SMALLINT", "smallint": "SMALLINT",
                "int": "INTEGER", "integer": "INTEGER", "long": "BIGINT",
                "bigint": "BIGINT", "float": "FLOAT", "real": "FLOAT",
                "double": "DOUBLE",
                "string": "VARCHAR", "date": "DATE", "timestamp": "TIMESTAMP",
                "timestamp_ntz": "TIMESTAMP", "binary": "BLOB",
            }
            fields = []
            self._declared_casts = []
            # self-contained scalar-DDL parse — pyspark's
            # _parse_datatype_string needs an ACTIVE SparkContext in
            # Spark 4, which would silently break the whole point of
            # this processor (genuinely Spark-free scoring)
            for name, s in _parse_scalar_ddl(schema):
                duck_t = (
                    s.upper() if s.startswith("decimal") else _DUCK.get(s)
                )
                if duck_t is None:
                    raise ValueError(
                        f"column {name!r}: type {s!r} not supported in "
                        f"sparkless scope (scalar types only)"
                    )
                fields.append(f'CAST(NULL AS {duck_t}) AS "{name}"')
                self._declared_casts.append((name, duck_t))
            self._con.execute(
                f"CREATE VIEW __qs_probe AS SELECT {', '.join(fields)} WHERE 1=0"
            )
        else:
            import pandas as pd

            self._declared_casts = None
            nulls = [k for k, v in sample_row.items() if v is None]
            if nulls:
                raise ValueError(
                    f"sample_row values for {nulls} are None — DuckDB "
                    f"would mis-infer their types; pass schema=... instead"
                )
            probe_df = pd.DataFrame([sample_row])
            self._con.register("__qs_probe", probe_df)
        types: List[str] = []
        for rs, r, sql in expanded:
            try:
                rel = self._con.sql(f"SELECT ({sql}) AS e FROM __qs_probe LIMIT 0")
                types.append(str(rel.types[0]))
            except Exception as e:
                raise RuleCompilationError(
                    f"rule {r.id} in set {rs.id} is not DuckDB-portable "
                    f"(sparkless scope is the shared SQL subset): {e}"
                ) from e

        self._rules = [
            (pack_id(rs.id), pack_id(r.id), encode_rule_sql_duck(sql, t))
            for (rs, r, sql), t in zip(expanded, types)
        ]
        self._suite_id = pack_id(suite.id)

        per_set: Dict[int, List[int]] = {}
        for i, (sid, _, _) in enumerate(self._rules):
            per_set.setdefault(sid, []).append(i)
        pp = suite.probable_pass
        # two-level select: the INNER level computes each encoded rule
        # exactly once under the collision-proof alias __qs_r_<i> (the
        # inner select is `SELECT *, ...` over the batch, so a bare
        # r_<i> alias would collide with an input column literally
        # named r_0 — ADVICE r04 low); the folds reference the aliases
        # and the OUTER level re-exports them under the documented
        # r_<i> output names (the outer select carries no input
        # columns, so no collision there). Inlining
        # the enc text into every fold repeated each rule's SQL ~7x
        # (and each enc already repeats the raw rule ~4x in its CASE
        # arms). Aliases are QUOTED: pack_id is signed, so a negative
        # set id would otherwise emit `AS s_-N` — a parser error.
        self._inner_select = ", ".join(
            f"({enc}) AS __qs_r_{i}" for i, (_, _, enc) in enumerate(self._rules)
        )
        outer = [f"__qs_r_{i} AS r_{i}" for i in range(len(self._rules))]
        outer += [
            f'({overall_result_sql([f"__qs_r_{i}" for i in idxs], pp)}) AS "s_{sid}"'
            for sid, idxs in per_set.items()
        ]
        outer.append(
            f"({overall_result_sql([f'__qs_r_{i}' for i in range(len(self._rules))], pp)})"
            " AS overall"
        )
        self._set_ids = list(per_set)
        self._select = ", ".join(outer)

    def process_pandas(self, pdf) -> "object":
        """Score a pandas batch → pandas frame of flat int columns
        (``r_<i>``, ``s_<setId>``, ``overall``), row-aligned with the
        input. The heavy path: one vectorized DuckDB projection.

        In schema mode the DECLARED types also govern execution: the
        batch relation is cast column-by-column before the rules run,
        so an all-null (object-dtype) pandas column cannot make DuckDB
        re-infer a different type than the one the rules compiled
        against."""
        self._con.register("__qs_batch_raw", pdf)
        if self._declared_casts is not None:
            casts = ", ".join(
                f'CAST("{c}" AS {t}) AS "{c}"' for c, t in self._declared_casts
            )
            self._con.execute(
                "CREATE OR REPLACE VIEW __qs_batch AS "
                f"SELECT {casts} FROM __qs_batch_raw"
            )
        else:
            self._con.execute(
                "CREATE OR REPLACE VIEW __qs_batch AS SELECT * FROM __qs_batch_raw"
            )
        return self._con.sql(
            f"SELECT {self._select} FROM "
            f"(SELECT *, {self._inner_select} FROM __qs_batch)"
        ).fetchdf()

    def process(self, rows: Iterable[Mapping]) -> List[Dict]:
        """Score dict rows → nested RuleSuiteResult dicts (same shape
        as the Spark runner's DQ struct ``asDict(True)``)."""
        import pandas as pd

        rows = list(rows)
        if not rows:
            return []
        flat = self.process_pandas(pd.DataFrame(rows))
        out: List[Dict] = []
        for i in range(len(flat)):
            row = flat.iloc[i]
            set_results = {
                sid: {"overallResult": int(row[f"s_{sid}"]), "ruleResults": {}}
                for sid in self._set_ids
            }
            for j, (sid, rid, _) in enumerate(self._rules):
                set_results[sid]["ruleResults"][rid] = int(row[f"r_{j}"])
            out.append(
                {
                    "id": self._suite_id,
                    "overallResult": int(row["overall"]),
                    "ruleSetResults": set_results,
                }
            )
        return out

    def process_one(self, row: Mapping) -> Dict:
        return self.process([row])[0]
