#!/usr/bin/env python3
"""Generate the committed cross-implementation oracle fixture for
`text_compression_ratio`: raw-deflate (level 6, wbits=-15 — the byte
stream java.util.zip.Deflater(DEFAULT_COMPRESSION, nowrap=true)
produces) lengths of every distinct document text across the three
testdata scale factors, keyed by md5(text). Content-addressed so the
oracle join works at any sf whose texts are covered; empty text maps to
0, matching DeflateSizeExpr's convention. Driver-side tooling only (the
Spark library never reads this file — it computes deflate_len live)."""
import zlib, hashlib, duckdb
import pyarrow as pa, pyarrow.parquet as pq

rows = {}
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    con = duckdb.connect()
    df = con.execute(
        f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
    ).fetch_arrow_table()
    for t in df.column("text").to_pylist():
        if t is None:
            continue
        b = t.encode("utf-8")
        h = hashlib.md5(b).hexdigest()
        if h in rows:
            continue
        if not b:
            rows[h] = 0
        else:
            c = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION, zlib.DEFLATED, -15)
            rows[h] = len(c.compress(b) + c.flush())

tbl = pa.table({"h": pa.array(list(rows.keys()), pa.string()),
                "deflate_len": pa.array(list(rows.values()), pa.int32())})
pq.write_table(tbl, "/root/repo/tools/fixtures/deflate_oracle.parquet",
               compression="zstd")
print("rows:", len(rows))
