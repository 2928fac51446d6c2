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

from typing import Dict, Iterable, List, Mapping, Sequence, Union

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .model import RuleSuite
from .operators.runner import rule_runner

__all__ = ["RowProcessor", "dq_factory"]


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
