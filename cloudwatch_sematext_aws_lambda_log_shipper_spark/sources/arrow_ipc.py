"""Arrow IPC (Feather v2) file format: distributed read/write over the
PUBLIC Arrow columnar IPC specification, using the pyarrow library that
ships with PySpark itself — no extra connector needed.

Why: the lake-format surface (files.py) covers parquet/ORC/JSONL/CSV/
text/Avro; Arrow IPC is the remaining interchange format a training
pipeline actually meets (Feather datasets, Arrow Flight dumps,
HuggingFace `datasets` cache files are Arrow IPC under the hood).
Unlike the Avro path there is no hand-rolled codec: Spark's Python
workers already speak Arrow, so `mapInArrow` moves RecordBatches
between the JVM and ``pyarrow.ipc`` with NO pandas hop and no
per-value Python — the validity bitmaps ride along natively, which is
why the Avro writer's NaN-vs-null masking machinery has no equivalent
here.

Layout: a directory of ``part-*.arrow`` IPC FILES (one per input
partition, one IPC record batch per Arrow batch crossing the worker
boundary — the same shape as the Avro writer). Read is a binaryFile
scan + per-file ``pa.ipc.open_file`` decode, so files split across
executors and filters applied above the read prune as usual.

Schema policy matches files.py: the reader takes an EXPLICIT schema;
the file schema must match by (name, Spark type) after the arrow->
spark mapping — a mismatch errors loudly instead of mis-decoding.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _arrow_target(schema: T.StructType):
    """The Arrow schema Spark's mapInArrow contract expects for a given
    Spark schema (public pyspark.sql.pandas.types mapping)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def write_arrow(df: DataFrame, path: str, mode: str = "overwrite") -> int:
    """Write ``df`` as a directory of Arrow IPC part files (one per
    input partition). Returns the total row count from the write
    manifest."""
    if mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.isdir(path):
        raise ValueError(f"path exists and mode={mode!r}")
    os.makedirs(path, exist_ok=True)

    def write_part(batches: Iterator) -> Iterator:
        import pyarrow as pa

        writer = None
        fname = ""
        n_total = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if writer is None:
                fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
                writer = pa.ipc.new_file(fname, batch.schema)
            writer.write_batch(batch)
            n_total += batch.num_rows
        if writer is not None:
            writer.close()
        yield pa.RecordBatch.from_pydict(
            {"file": [fname], "n_rows": [n_total]},
            schema=pa.schema(
                [pa.field("file", pa.string()), pa.field("n_rows", pa.int64())]
            ),
        )

    manifest = df.mapInArrow(write_part, "file string, n_rows long").collect()
    return int(sum(r.n_rows for r in manifest))


def read_arrow(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Distributed IPC read: binaryFile scan + per-file open_file
    decode. ``schema`` is explicit (files.py policy: no inference
    pass); field (name, type) pairs must match the file schema."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names = [f.name for f in schema.fields]

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrow")
        .load(path)
        .select("content")
    )

    def decode(batches: Iterator) -> Iterator:
        import pyarrow as pa

        from pyspark.sql.pandas.types import from_arrow_type

        # the target arrow schema is resolved on the WORKER (it depends
        # on the session timezone only through the JVM conf already
        # captured in `schema`'s types, so building it here is safe)
        target = _arrow_target(schema)
        for batch in batches:
            for buf in batch.column(0):
                reader = pa.ipc.open_file(pa.BufferReader(buf.as_py()))
                file_schema = reader.schema
                # prefer_timestamp_ntz: a tz-less arrow timestamp IS
                # NTZ here (the writer emits LTZ with an explicit tz),
                # so the round-trip keeps the two flavors distinct
                got = {
                    f.name: from_arrow_type(
                        f.type, prefer_timestamp_ntz=True
                    ).simpleString()
                    for f in file_schema
                }
                want = {f.name: f.dataType.simpleString() for f in schema.fields}
                if got != want:
                    raise ValueError(
                        f"arrow schema mismatch: file has {got}, reader "
                        f"asked for {want}"
                    )
                for i in range(reader.num_record_batches):
                    rb = reader.get_batch(i)
                    # reorder to the reader's column order and normalize
                    # representational differences the spark<->arrow hop
                    # allows (e.g. timestamp tz spelling) via cast
                    tbl = pa.Table.from_batches([rb]).select(names).cast(target)
                    for out in tbl.to_batches():
                        yield out

    return files.mapInArrow(decode, schema)
