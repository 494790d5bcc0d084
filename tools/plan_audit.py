"""Plan-quality audit: physical-plan red flags for every registered query.

Reports per query: CartesianProduct occurrences (always a bug here),
row-level Exchange count OUTSIDE cached subtrees (InMemoryRelation bodies
repeat their build plan's text per reuse site — counting those overstates
real shuffles), and the broadcast/shuffled join mix. (Whole-stage-codegen
spans only materialize in the final adaptive plan after execution, so
they are not inspectable from the pre-execution plan AQE prints.)
Streaming queries are skipped (they execute on construction).

Usage: PYTHONPATH=. python tools/plan_audit.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import re
import sys


def audit_plan(plan: str) -> dict:
    lines = plan.splitlines()
    # drop the textual bodies of InMemoryRelation nodes: their build plan
    # is repeated verbatim at every reuse site
    kept = []
    in_cache_depth = None
    for line in lines:
        indent = len(line) - len(line.lstrip(" :+-*("))
        if in_cache_depth is not None:
            if indent > in_cache_depth:
                continue
            in_cache_depth = None
        if "InMemoryRelation" in line:
            in_cache_depth = indent
        kept.append(line)
    top = "\n".join(kept)
    return {
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": len(re.findall(r"\bExchange (hash|range|single)", top)),
        "bhj": top.count("BroadcastHashJoin"),
        "smj": top.count("SortMergeJoin"),
        "shj": top.count("ShuffledHashJoin"),
        "bnlj": top.count("BroadcastNestedLoopJoin"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]

    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.session import get_spark

    spark = get_spark("plan-audit")
    bad = 0
    for name, fn in sorted(all_queries().items()):
        if name.startswith("q_stream"):
            continue
        if name_filters and not any(f in name for f in name_filters):
            continue
        try:
            df = fn(spark, sf_dir)
            a = audit_plan(df._jdf.queryExecution().executedPlan().toString())
        except Exception as exc:  # pragma: no cover - audit robustness
            print(f"ERROR {name}: {exc}")
            bad += 1
            continue
        # q_join_cross is the one deliberate cartesian (tiny dim × itself)
        unexpected_cartesian = a["cartesian"] and name != "q_join_cross"
        flag = " <-- CARTESIAN" if unexpected_cartesian else ""
        if unexpected_cartesian:
            bad += 1
        print(
            f"{name}: exchanges={a['exchanges']} joins="
            f"bhj:{a['bhj']}/smj:{a['smj']}/shj:{a['shj']}/bnlj:{a['bnlj']}{flag}"
        )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
