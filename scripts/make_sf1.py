#!/usr/bin/env python
"""Derive an sf1-scale benchmark dataset from the driver's sf0.1
parquet by replicating fact tables 10× with shifted keys (TPC-H-style
scaling: dimension tables stay fixed, fact keys shift per copy so the
join topology replicates instead of piling rows onto the same keys).

Bench-only data — the correctness oracle always runs on the driver's
own sf dirs. Usage:  python scripts/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pyarrow.compute as pc
import pyarrow as pa

SRC = "/root/testdata/sf0.1"
COPIES = 10

# table → columns shifted by copy * (max(primary domain)+1 of the
# table that owns them); dims (region, nation) copied once, unshifted
SHIFT_OWNERS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
FOREIGN = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "events": {"user_id": "customer"},
}
DIMS = ["region", "nation"]


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spans: dict[str, int] = {}
    for tbl, key in SHIFT_OWNERS.items():
        t = pq.read_table(f"{SRC}/{tbl}.parquet", columns=[key])
        spans[tbl] = int(pc.max(t[key]).as_py()) + 1

    for tbl in DIMS:
        pq.write_table(pq.read_table(f"{SRC}/{tbl}.parquet"), f"{out_dir}/{tbl}.parquet")
        print(f"{tbl}: dim copied")

    for tbl in list(SHIFT_OWNERS) + ["lineitem"]:
        t = pq.read_table(f"{SRC}/{tbl}.parquet")
        shifted_cols = {}
        if tbl in SHIFT_OWNERS:
            shifted_cols[SHIFT_OWNERS[tbl]] = spans[tbl]
        for col, owner in FOREIGN.get(tbl, {}).items():
            shifted_cols[col] = spans[owner]
        copies = []
        for c in range(COPIES):
            if c == 0:
                copies.append(t)
                continue
            cols = []
            for name in t.column_names:
                arr = t[name]
                if name in shifted_cols:
                    arr = pc.add(arr, pa.scalar(c * shifted_cols[name], type=arr.type))
                elif tbl == "documents" and name == "text":
                    # tag the FIRST token per copy: block keys (leading
                    # words) then replicate 10× at original block size
                    # — "10× more entities" — instead of every block
                    # inflating 10× (which would make within-block pair
                    # work grow 100×, a duplication artifact, not scale)
                    texts = arr.to_pylist()
                    tagged = []
                    for s in texts:
                        head, _, rest = (s or "").partition(" ")
                        tagged.append(f"{head}x{c} {rest}" if rest else f"{head}x{c}")
                    arr = pa.chunked_array([pa.array(tagged, type=pa.string())])
                cols.append(arr)
            copies.append(pa.table(cols, names=t.column_names))
        big = pa.concat_tables(copies)
        # write as a 32-file directory: a single small parquet file is
        # one Spark input split regardless of core count, which would
        # serialize the scan-heavy queries and fake a scaling wall
        d = f"{out_dir}/{tbl}.parquet"
        os.makedirs(d, exist_ok=True)
        n_files = 32
        step = (big.num_rows + n_files - 1) // n_files
        for i in range(n_files):
            chunk = big.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, f"{d}/part-{i:05d}.parquet")
        print(f"{tbl}: {t.num_rows} -> {big.num_rows} ({n_files} files)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
