"""Capture `.explain("formatted")` for declared queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [query ...]        # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 applies as in bench.py.

Writes plans/<tag>/<query>_<suffix>.txt where suffix is "before" or
"after" — pass it via --suffix (default "before"). Pure plan capture:
nothing is executed, so timings are unaffected.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from penr_oz_agent_memory_rust_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="poz-plan-capture")
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
