#!/usr/bin/env python
"""Capture `.explain("formatted")` for named catalog entries into
plans/r12/<name>_<tag>.txt (the optimization-round evidence artifact).

Usage: python scripts/capture_plans.py <tag> name [name...] 2>/dev/null
       python scripts/capture_plans.py <tag> --all 2>/dev/null
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from rdw_spark.plans.catalog import get_catalog  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402

OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r13")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    catalog = get_catalog()
    if names == ["--all"]:
        names = sorted(catalog)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("rdw-plan-capture")
    for name in names:
        df = catalog[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
