#!/usr/bin/env python3
"""Build a synthetic sf10 spot directory (100x sf0.1) for the three
highest-shuffle-risk bench entries only.

Bench-only tooling (driver-side python; NOT part of the Scala library).
Same construction as gen_sf1.py (key columns shifted per copy so joins
stay valid and key cardinality scales; documents.source suffixed per
copy so blocking keys scale linearly), but only the tables those three
entries read are generated, keeping the footprint ~2 GB:
  - dedup_minhash_lsh  -> documents
  - cdc_delete_stress  -> events
  - cdc_spj_join       -> customer, orders
region/nation ride along for the bench warmup scan.
"""
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/tmp/sf10"
COPIES = 100
STRIDE = 100_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}


def scaled(table_name):
    t = pq.read_table(f"{SRC}/{table_name}.parquet")
    out = []
    for i in range(COPIES):
        c = t
        for col in SHIFT_COLS[table_name]:
            idx = c.schema.get_field_index(col)
            typ = c.schema.field(idx).type
            shifted = pc.add(c.column(col), pa.scalar(i * STRIDE, type=typ))
            c = c.set_column(idx, c.schema.field(idx), shifted)
        if table_name == "documents":
            idx = c.schema.get_field_index("source")
            suff = pc.binary_join_element_wise(
                c.column("source").cast(pa.string()), f"_c{i}", "")
            c = c.set_column(idx, c.schema.field(idx),
                             suff.cast(c.schema.field(idx).type))
        out.append(c)
    return pa.concat_tables(out)


def main():
    os.makedirs(DST, exist_ok=True)
    for name in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{DST}/{name}.parquet")
        print(name, "copied")
    for name in SHIFT_COLS:
        t = scaled(name)
        pq.write_table(t, f"{DST}/{name}.parquet", row_group_size=131072)
        print(name, t.num_rows, "rows")


if __name__ == "__main__":
    main()
