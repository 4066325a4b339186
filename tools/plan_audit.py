"""Physical-plan audit of the driver queries: for each query, count
live-plan exchanges, sorts, and join strategies, and flag plan smells
(sort-merge joins and per-row Python evals in hot paths).

"Live plan" excludes the cached build inside InMemoryRelation blocks —
those execute once at materialization, not per run.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_plan(plan: str) -> dict:
    live = plan.split("InMemoryRelation")[0]
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", live)),
        "sorts": len(re.findall(r"\bSort \[", live)),
        "smj": len(re.findall(r"SortMergeJoin", live)),
        "shj": len(re.findall(r"ShuffledHashJoin", live)),
        "bhj": len(re.findall(r"BroadcastHashJoin", live)),
        "python_eval": len(re.findall(r"BatchEvalPython", live)),
        "arrow_eval": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", live)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", live))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from neo4j_graph_algorithms_spark import driver_queries as dq
    from neo4j_graph_algorithms_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cores=8, shuffle_partitions=8)
    print(f"{'query':32s} {'exch':>4} {'sort':>4} {'SMJ':>3} {'SHJ':>3} {'BHJ':>3} "
          f"{'pyRow':>5} {'arrow':>5} {'wscg':>4}")
    smells = []
    for name, fn in dq.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        except Exception as e:  # iterative queries execute during build — fine
            print(f"{name:32s} ERROR {str(e)[:60]}")
            continue
        a = audit_plan(plan)
        print(f"{name:32s} {a['exchanges']:>4} {a['sorts']:>4} {a['smj']:>3} "
              f"{a['shj']:>3} {a['bhj']:>3} {a['python_eval']:>5} "
              f"{a['arrow_eval']:>5} {a['codegen_spans']:>4}")
        if a["python_eval"]:
            smells.append(f"{name}: {a['python_eval']} per-row Python eval(s)")
        if a["smj"] > 0 and a["sorts"] >= 2 * a["smj"]:
            smells.append(f"{name}: {a['smj']} SMJ(s) sorting both sides")
    print()
    if smells:
        print("plan smells:")
        for s in smells:
            print(" -", s)
    else:
        print("no plan smells (no per-row Python, no both-side-sorting SMJs)")


if __name__ == "__main__":
    main()
