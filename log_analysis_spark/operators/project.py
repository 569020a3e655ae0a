"""Projection operators (SURVEY.md §2.2 P1/P2, §2.8 F8).

  * P1 — select + canonical rename: strip a key prefix and snake_case the
    rest (HyraxLogAnalysis.jl:78-88 ``replace(s, "hyrax-" => "", "-"=>"_")``)
  * P2 — priority-first column reorder (reorder-records.py:8-25)
  * F8 — key extraction with default sentinel (``record.get(key, "")``,
    ngap-logs.py:202-206)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reorder_priority(df: DataFrame, priority: list[str]) -> DataFrame:
    """P2 — emit ``priority`` columns first (those present), then the rest in
    their existing order.  Pure projection: no expression evaluation."""
    head = [c for c in priority if c in df.columns]
    tail = [c for c in df.columns if c not in head]
    return df.select(*head, *tail)


def canonical_rename(df: DataFrame, strip_prefix: str = "hyrax-") -> DataFrame:
    """P1 — one naming pass: drop ``strip_prefix``, '-' → '_'."""
    out = df
    for c in df.columns:
        new = c.removeprefix(strip_prefix).replace("-", "_")
        if new != c:
            out = out.withColumnRenamed(c, new)
    return out


def get_with_default(col: str, default: str = "") -> F.Column:
    """F8 — ``record.get(key, "")``: missing/null becomes the sentinel."""
    return F.coalesce(F.col(col), F.lit(default))
