"""Plan self-audit: print the pushdown/shuffle-relevant lines of the
physical plan for each headline driver query.

Usage: python tools/plan_audit.py [sf_dir] [only,names]

For every query it extracts: scan pushdown evidence (PartitionFilters /
PushedFilters / ReadSchema), exchange (shuffle) count and keys, broadcast
joins, WholeStageCodegen span count, and flags suspicious shapes
(CartesianProduct, single-partition exchanges feeding large inputs,
row-at-a-time Python UDFs). The committed PLANS.md is this script's
output plus commentary.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import __spark_entry__ as entrymod
from tachyon_spark.session import get_spark

INTERESTING = (
    "PartitionFilters",
    "PushedFilters",
    "ReadSchema",
    "Exchange",
    "BroadcastExchange",
    "CartesianProduct",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "WindowExec",
)


def audit(name: str, df) -> list[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    lines = []
    # explain("formatted") splits the operator name and its arguments onto
    # separate lines — "(4) Exchange" + "Arguments: hashpartitioning(...)"
    # — so match the Arguments lines (the pre-round-4 name+args regexes
    # matched nothing in formatted mode and under-reported every count).
    n_exch = len(
        re.findall(r"Arguments: hashpartitioning|\bExchange hashpartitioning", plan)
    )
    n_range = len(re.findall(r"Arguments: rangepartitioning", plan))
    # spread()/repartition(n) exchanges: real shuffles, counted separately
    # so the reader can tell a keyed exchange from a parallelism respread
    # (r12 honesty fix — these were previously not counted at all)
    n_rr = len(re.findall(r"Arguments: RoundRobinPartitioning", plan))
    n_single = len(
        re.findall(r"Arguments: SinglePartition|\bExchange SinglePartition", plan)
    )
    n_bcast = len(re.findall(r"BroadcastExchange", plan))
    n_pyudf = len(re.findall(r"BatchEvalPython", plan))
    n_arrow = len(re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan))
    cart = "CartesianProduct" in plan
    lines.append(
        f"shuffles={n_exch} range_shuffles={n_range} "
        f"roundrobin_shuffles={n_rr} "
        f"single_partition_exchanges={n_single} "
        f"broadcasts={n_bcast} "
        f"python_row_udfs={n_pyudf} arrow_kernels={n_arrow}"
        + (" CARTESIAN!" if cart else "")
    )
    for m in re.finditer(r"(PartitionFilters: \[[^\]]*\]|PushedFilters: \[[^\]]*\]|ReadSchema: [^\n]*)", plan):
        frag = m.group(1)
        if len(frag) > 150:
            frag = frag[:147] + "..."
        lines.append("  " + frag)
    if n_pyudf:
        lines.append("  WARNING: row-at-a-time Python UDF in plan")
    return lines


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    skip = {"continuous_rollup"}  # runs a streaming job, not a single plan
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            continue
        try:
            df = fn(spark, sf_dir)
            print(f"== {name}")
            for line in audit(name, df):
                print(line)
        except Exception as e:  # pragma: no cover
            print(f"== {name}\n  ERROR: {e}")


if __name__ == "__main__":
    main()
