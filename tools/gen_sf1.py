#!/usr/bin/env python3
"""Build a synthetic sf1 bench directory by replicating sf0.1 ten times.

Bench-only tooling (driver-side python; NOT part of the Scala library).
The driver owns /root/testdata (read-only to us), so the scaled copy
lives under tmp/sf1 and is gitignored.

Construction (documented in SCALING.md):
- Fact tables (orders, lineitem, events, documents, embeddings) and the
  growable dims (customer, supplier, part) are replicated 10x with every
  key column shifted by copy*STRIDE, so referential joins stay valid and
  key cardinality scales with the data.
- region/nation are fixed-size dimensions (as in TPC-H) and are copied
  as-is.
- Blocking keys scale with the corpus, as any real blocking key must:
  documents.source gets a per-copy suffix and embeddings.label a
  per-copy offset, so the all-pairs-within-block oracle primitives
  (dedup_jaccard_pairs, embed_neardup) grow linearly, not
  quadratically.
- events.ts is left unshifted: 10x the users in the same time range
  (denser traffic, same windows).
"""
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/tmp/sf1"
COPIES = 10
STRIDE = 100_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
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
            c = c.set_column(idx, c.schema.field(idx), suff.cast(c.schema.field(idx).type))
        if table_name == "embeddings":
            idx = c.schema.get_field_index("label")
            shifted = pc.add(c.column("label"), pa.scalar(i * 1000, type=pa.int32()))
            c = c.set_column(idx, c.schema.field(idx), shifted)
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
