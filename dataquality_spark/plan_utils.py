"""Shared physical-plan inspection helpers (used by tests/test_plans.py
and tools/plan_report.py so the two can't drift apart).

The FORMATTED explain is the only representation that (a) lists each
operator exactly once (the raw tree toString re-prints reused AQE
subtrees) and (b) carries each Exchange's full input schema. Under AQE
the final plan (codegen regions, runtime-chosen join strategies) only
exists after the DataFrame's OWN QueryExecution has run — a noop write
executes a different QueryExecution and finalizes nothing — so
``formatted_plan(df, execute=True)`` collects the frame first.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, execute: bool = False) -> str:
    if execute:
        # finalize THIS df's QueryExecution under AQE — a separate action
        # (count()/noop write) builds its own QE and finalizes nothing.
        # Audit/test-scale frames only: collect() pulls rows to the driver.
        df.collect()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def operator_blocks(plan: str) -> list[str]:
    """The detail section split into per-operator blocks, each starting
    with its '(n) OperatorName' header."""
    parts = re.split(r"(?m)^(?=\(\d+\) )", plan)
    return [p for p in parts if re.match(r"\(\d+\) ", p)]


def exchange_inputs(plan: str) -> list[str]:
    """Each Exchange operator's full input column list."""
    return re.findall(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
