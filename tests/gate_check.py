"""Local replica of the driver's correctness compare: run each gate query on
Spark AND its DuckDB oracle at sf0.01, compare row count, column names and
order-insensitive values.  Usable as a script for fast iteration:

    python tests/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(rows: list[dict]) -> list[tuple]:
    """Sort columns by name, round floats, canonicalize timestamps (a
    datetime and a pandas Timestamp repr-sort differently even when equal),
    sort rows — order-insensitive."""
    import datetime

    out = []
    for r in rows:
        vals = []
        for k in sorted(r):
            v = r[k]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            elif isinstance(v, datetime.datetime):
                v = v.isoformat()
            elif type(v).__name__ == "Timestamp":  # pandas
                v = v.to_pydatetime().isoformat()
            vals.append((k, v))
        out.append(tuple(vals))
    return sorted(out, key=repr)


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    from searchengine_spark.gate import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    got = normalize([r.asDict() for r in sdf.collect()])
    if name not in ORACLE:
        return True, f"rows-only: {len(got)} rows"
    odf = con.sql(ORACLE[name]).df()
    want = normalize(odf.to_dict("records"))
    if len(got) != len(want):
        return False, f"row count: spark={len(got)} duckdb={len(want)}"
    gc = [c for c, _ in got[0]] if got else []
    wc = [c for c, _ in want[0]] if want else []
    if gc != wc:
        return False, f"columns: spark={gc} duckdb={wc}"
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            return False, f"row {i}: spark={g} duckdb={w}"
    return True, f"{len(got)} rows match"


def main() -> int:
    from searchengine_spark.gate import QUERIES
    from searchengine_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("gate_check", cores=8, shuffle_partitions=8)
    con = duck_conn(sf_dir)
    failed = []
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
