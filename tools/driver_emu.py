"""Driver-harness emulation (the /verify recipe, value-level).

Runs every `__spark_entry__.queries()` entry at sf0.01 on a VANILLA
session (the driver builds its own, not our factory) and value-compares
each oracle against DuckDB with tests/compare.py::assert_frames_match —
the same order-insensitive check the driver's correctness gate applies.

Usage: python tools/driver_emu.py [name_substring ...]
  With args, only entries whose name contains one of the substrings run
  (fast re-check after touching a family); with none, the full catalog.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_EMU_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    filters = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-emu")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from tests.compare import assert_frames_match
    # one source of truth for the oracle environment: the test suite's
    # registration helper (table list + directory-glob handling) — a
    # second copy here would drift the emulator from the local gate
    from tests.conftest import _register

    print("entry rows:", len(E.entry(spark).collect()), flush=True)
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    _register(con, SF_DIR)
    names = sorted(qs)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]
    n_ok = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            s = qs[name](spark, SF_DIR).toPandas()
            if name in osql:
                d = con.execute(osql[name]).df()
                assert_frames_match(s, d, name)
                n_ok += 1
                tag = "OK"
            else:
                # rows-only: toPandas() completing IS the check (the
                # driver's weaker gate); shape/value pins live in pytest
                n_rows_only += 1
                tag = "OK(rows-only)"
            print(
                f"{tag} {name} rows={len(s)} "
                f"{time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        except Exception:
            n_fail += 1
            print(f"FAIL {name}", flush=True)
            traceback.print_exc()
    print(
        f"SUMMARY oracles_ok={n_ok} rows_only={n_rows_only} fail={n_fail} "
        f"of {len(names)}",
        flush=True,
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
