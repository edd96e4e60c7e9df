#!/usr/bin/env python
"""Standalone input validator — the engine's analog of the reference's
rdw-ingest-validator CLI (tools/README.md:55-68).

usage: validate.py [-s SUBJECT_XML]... [-t PACKAGE_CSV]...

Prints per-file OK / error lines; exit code 1 if any file is invalid.
Pure Python — no Spark session, starts instantly."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdw_spark.sources.validator import validate_package_csv, validate_subject_xml


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Validator for RDW subject and test package files"
    )
    ap.add_argument("-s", "--subject", action="append", default=[],
                    help="subject file (repeatable)")
    ap.add_argument("-t", "--test-package", action="append", default=[],
                    help="test package (tabulator) file (repeatable)")
    args = ap.parse_args()
    if not args.subject and not args.test_package:
        ap.error("Specify at least one subject (-s) or test package (-t) file")

    rc = 0
    for path in args.subject:
        with open(path, "rb") as fh:
            errors = validate_subject_xml(fh.read())
        rc |= _report("subject", path, errors)
    for path in args.test_package:
        with open(path, encoding="utf-8") as fh:
            errors = validate_package_csv(fh.read())
        rc |= _report("package", path, errors)
    return rc


def _report(kind: str, path: str, errors: list[str]) -> int:
    if errors:
        print(f"INVALID {kind} {path}")
        for e in errors:
            print(f"  {e}")
        return 1
    print(f"OK      {kind} {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
