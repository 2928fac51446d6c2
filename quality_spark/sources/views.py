"""Dependency-ordered temp-view loading.

Reference: impl/views/ViewLoading.scala:54-121 — config rows
``(name, token | sql, filter?)`` become ``createOrReplaceTempView``s,
created in dependency order with a bounded retry loop so views may
reference each other (cycles are reported, not looped forever).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ViewConfig:
    name: str
    sql: Optional[str] = None
    token: Optional[str] = None
    filter: Optional[str] = None


class ViewLoadError(RuntimeError):
    def __init__(self, failures: Dict[str, str]):
        self.failures = failures
        super().__init__(
            "views failed to load (cyclic or invalid): "
            + ", ".join(f"{k}: {v.splitlines()[0][:120]}" for k, v in failures.items())
        )


def load_view_configs(df: DataFrame) -> List[ViewConfig]:
    cols = set(df.columns)
    out = []
    for row in df.collect():
        out.append(
            ViewConfig(
                name=row["name"],
                sql=row["sql"] if "sql" in cols else None,
                token=row["token"] if "token" in cols else None,
                filter=row["filter"] if "filter" in cols else None,
            )
        )
    return out


def load_views(
    spark: SparkSession,
    configs: Union[DataFrame, Sequence[ViewConfig]],
    loader=None,
    max_rounds: Optional[int] = None,
) -> List[str]:
    """Create all views; returns creation order. ``loader`` maps a
    token to a DataFrame (the reference's DataFrameLoader hook,
    model.scala:19-21)."""
    if isinstance(configs, DataFrame):
        configs = load_view_configs(configs)
    pending = list(configs)
    created: List[str] = []
    rounds = max_rounds if max_rounds is not None else len(pending) + 1
    failures: Dict[str, str] = {}
    for _ in range(rounds):
        if not pending:
            break
        progressed = False
        still: List[ViewConfig] = []
        failures = {}
        for cfg in pending:
            try:
                if cfg.sql:
                    df = spark.sql(cfg.sql)
                elif cfg.token and loader is not None:
                    df = loader(cfg.token)
                elif cfg.token:
                    df = spark.table(cfg.token)
                else:
                    raise ValueError(f"view {cfg.name!r} has neither sql nor token")
                if cfg.filter:
                    df = df.filter(F.expr(cfg.filter))
                df.createOrReplaceTempView(cfg.name)
                created.append(cfg.name)
                progressed = True
            except Exception as e:  # noqa: BLE001 — retried next round
                failures[cfg.name] = str(e)
                still.append(cfg)
        pending = still
        if not progressed:
            raise ViewLoadError(failures)
    if pending:
        raise ViewLoadError(failures)
    return created
