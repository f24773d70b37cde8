"""Driver-gate rehearsal: run selected queries() entries vs their DuckDB
oracles at sf0.01 with the helpers.assert_matches comparison."""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as em
from sparksqlplus_spark.session import get_spark
from tests.helpers import assert_matches

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark(app_name="check_entries", master="local[16]")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

qs = em.queries()
oracles = em.oracle_sql()
print(f"total entries: {len(qs)}; first 50 covers: "
      f"{[n for n in list(qs)[:50] if n in em._HEAD]}; tail: {list(qs)[50:]}")

failed = []
for name in (names or list(qs)):
    t0 = time.time()
    try:
        df = qs[name](spark, SF_DIR)
        if name in oracles:
            assert_matches(df, con, oracles[name], tol=1e-9)
            status = "OK"
        else:
            n = df.count()
            status = f"rows-only OK ({n})"
    except Exception as exc:
        status = f"FAIL: {exc}"
        failed.append(name)
    print(f"{name}: {status} ({time.time()-t0:.1f}s)", flush=True)

print("FAILED:", failed if failed else "none")
