"""Scale the driver testdata up one decade for local robustness passes.

Builds an sf1-equivalent directory from /root/testdata/sf0.1 by unioning
``factor`` id-offset copies of every scaled table (DuckDB, no Spark):
fact/entity keys are offset per copy so joins stay consistent and ids stay
unique; document texts get a per-copy suffix token so the corpus isn't 90%
exact duplicates by construction; dimension tables (region/nation/
supplier/part) keep their size, as a real star schema would.

The driver's own testdata is read-only (TESTDATA.md) — output goes to a
throwaway dir (default /dev/shm/sf1, tmpfs like the bench shuffle dirs).

    PYTHONPATH=. python tests/make_sf_big.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> (key columns to offset, text column to perturb or None)
SCALED = {
    "customer": (["c_custkey"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}
# FK columns must be offset by the REFERENCED table's max key, not the
# referencing table's own max: in TPC-H-ish data some customers have no
# orders, so max(o_custkey) < max(c_custkey) and a per-table offset would
# point copy k's orders at custkeys that don't exist in copy k's customers.
FK_SOURCE = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
}
DIMS = ["region", "nation", "supplier", "part"]


def build(out_dir: str, factor: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, (keys, text_col) in SCALED.items():
        src = f"'{SRC}/{t}.parquet'"
        offsets = {}
        for k in keys:
            ref_t, ref_k = FK_SOURCE.get(k, (t, k))
            offsets[k] = con.execute(
                f"SELECT max({ref_k}) + 1 FROM '{SRC}/{ref_t}.parquet'"
            ).fetchone()[0]
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        sel = []
        for c in cols:
            if c in offsets:
                sel.append(f"{c} + g.copy * {offsets[c]} AS {c}")
            elif c == text_col:
                # per-copy suffix: copies are NEAR-duplicates (realistic
                # near-dup density) instead of exact ones
                sel.append(
                    f"CASE WHEN g.copy = 0 THEN {c} ELSE {c} || "
                    f"' c' || g.copy END AS {c}"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM {src}, "
            f"(SELECT CAST(range AS BIGINT) AS copy FROM range({factor})) g) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, factor)
