"""Ingestion: alternative source formats → the canonical image table.

The reference ingests one JSON document per record (``DataUpload``
parsing via Play JSON codecs, Tests.scala:10,47; one JSON file per
record in the repository, MTBValidationRepository.scala:36-39).  The
engine's analog is a JSONL ingest: one JSON object per line with the
payload base64-encoded, converted by a streaming ``map_batches`` pass
into the pinned Arrow schema and written as sharded Parquet — after
which every pipeline (validation, job, stats) runs unchanged.

Scale notes: `read_json` splits by file; decoding is vectorized except
the per-row base64 (cheap, stdlib C); output shards preserve the
`partition_id` column for checkpointing.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import ray.data as rd

from ..schema import IMAGE_SCHEMA_PARTITIONED, PARTITION_COL


def _records_to_canonical(batch: pa.Table) -> pa.Table:
    """JSONL record batch → pinned image schema (payload base64 →
    binary; missing fields → nulls)."""
    n = batch.num_rows
    names = set(batch.column_names)

    def col(name, typ, default=None):
        if name in names:
            return batch.column(name).cast(typ)
        return pa.nulls(n, typ)

    payload_b64 = (
        batch.column("bytes_b64").to_pylist() if "bytes_b64" in names else [None] * n
    )
    payloads = [
        base64.b64decode(v) if isinstance(v, str) else None for v in payload_b64
    ]
    return pa.table(
        {
            "image_id": col("image_id", pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "w": col("w", pa.int32()),
            "h": col("h", pa.int32()),
            "fmt": col("fmt", pa.string()),
            "caption": col("caption", pa.string()),
            "phash": col("phash", pa.int64()),
            PARTITION_COL: col(PARTITION_COL, pa.int32()),
        },
        schema=IMAGE_SCHEMA_PARTITIONED,
    )


def read_jsonl_images(paths: str | list[str]) -> rd.Dataset:
    """Streaming JSONL → canonical image Dataset."""
    return rd.read_json(paths).map_batches(
        _records_to_canonical, batch_format="pyarrow", zero_copy_batch=True
    )


def ingest_jsonl(paths: str | list[str], out_dir: str) -> int:
    """Convert a JSONL drop to the canonical sharded-Parquet layout;
    returns the row count."""
    ds = read_jsonl_images(paths)
    ds.write_parquet(out_dir, compression="none")
    import glob
    import os

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(out_dir, "*.parquet"))
    )


def write_jsonl_images(table: pa.Table, path: str) -> None:
    """Test helper: canonical table → JSONL with base64 payloads."""
    import json

    with open(path, "w") as f:
        for row in table.to_pylist():
            payload = row.pop("bytes", None)
            row["bytes_b64"] = (
                base64.b64encode(payload).decode("ascii") if payload else None
            )
            f.write(json.dumps(row) + "\n")
