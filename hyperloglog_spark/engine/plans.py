"""Physical-plan audit helpers.

"Would this plan survive a 100× scale-up?" is checked mechanically here:
tests (tests/test_plans.py) assert that the operators' physical plans keep
the properties that make them scale — column pruning reaching the parquet
scan, filter pushdown, and a bounded number of shuffles — so a regression
that, say, drags the full row through the sketch build fails CI instead of
surfacing as a 6× slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan in the plan (column-pruning witness)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan_string(df))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters of every scan (predicate-pushdown witness)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (each Exchange is a full network barrier
    at cluster scale — the number to budget, not discover, per operator)."""
    return len(re.findall(r"\bExchange\b", plan_string(df, "simple")))


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in scan_read_schemas(df):
        for field in schema.split(","):
            if ":" in field:
                cols.add(field.split(":", 1)[0])
    return cols


def assert_pruned_scan(df: DataFrame, allowed: set[str]) -> None:
    got = scan_columns(df)
    extra = got - set(allowed)
    assert not extra, (
        f"scan reads columns {sorted(extra)} beyond the required "
        f"{sorted(allowed)} — column pruning regressed"
    )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    got = n_exchanges(df)
    assert got <= n, (
        f"plan has {got} shuffles, budget is {n}:\n{plan_string(df, 'simple')}"
    )
