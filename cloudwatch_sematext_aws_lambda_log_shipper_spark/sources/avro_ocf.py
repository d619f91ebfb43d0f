"""Minimal Apache Avro Object Container File codec — pure Python,
built from the PUBLIC format specification (Avro 1.12 spec: magic
``Obj\\x01``, metadata map, 16-byte sync marker, zigzag-varint longs,
little-endian IEEE floats, length-prefixed bytes/strings).

Why vendored: this container ships Avro's core Java jars but NOT the
``spark-avro`` DataSource connector, so ``format("avro")`` cannot
resolve (probe documented in sources/files.py). This path closes the
file-format box without the connector:

- :func:`write_avro` — DISTRIBUTED: each input partition serializes to
  one ``.avro`` container file inside a ``mapInPandas`` pass (one Avro
  block per Arrow batch, so memory stays bounded at batch size); the
  driver only collects a tiny (file, n_rows) manifest.
- :func:`read_avro` — DISTRIBUTED: ``binaryFile`` scan of ``*.avro``
  plus a ``mapInPandas`` block decoder; whole-file parallelism, the
  natural split unit here (one writer partition = one file).

Type coverage (the engine's round-trip surface, lossless like the
other files.py formats): boolean, int, long, float, double, string,
bytes, nullable unions thereof, and ``timestamp-micros`` /
``local-timestamp-micros`` logical longs for TIMESTAMP /
TIMESTAMP_NTZ. Codecs: ``null`` and ``deflate`` (zlib raw).

Nested records/arrays/maps are out of scope — the connector remains
the right tool where it can be deployed; the module errors loudly on
unsupported types instead of guessing.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import uuid
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_PRIMITIVES: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
]


def _kind(dt: T.DataType) -> str:
    """Internal type tag for the row codec (timestamps ride on long)."""
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_ntz"
    for cls, name in _PRIMITIVES:
        if isinstance(dt, cls):
            return name
    raise ValueError(f"avro_ocf: unsupported Spark type {dt.simpleString()}")


def _avro_type(kind: str):
    if kind == "timestamp":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if kind == "timestamp_ntz":
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    return kind


def avro_schema_for(schema: T.StructType, name: str = "spark_row") -> dict:
    fields = []
    for f in schema.fields:
        at = _avro_type(_kind(f.dataType))
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


# --- binary primitives ----------------------------------------------------


def _enc_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (python ints: arbitrary precision)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _enc_bytes(out: bytearray, b: bytes) -> None:
    _enc_long(out, len(b))
    out += b


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return buf[pos : pos + n], pos + n


# --- write ---------------------------------------------------------------


def _column_values(pdf, name: str, kind: str, mask_col: str | None) -> list:
    """Python values (None for null) for one column of an Arrow batch.
    Integer columns go through pandas' nullable Int64 so a null-bearing
    column (which Arrow hands over as float64) round-trips exactly.
    Float/double columns use a JVM-computed not-null mask (``mask_col``)
    because pandas float64 conflates SQL NULL with a legitimate NaN
    value — ``pd.isna`` alone would silently turn NaN into null."""
    import pandas as pd

    s = pdf[name]
    if kind in ("float", "double"):
        if mask_col is not None:  # nullable: mask decides, NaN is a value
            return [
                float(v) if nn else None
                for v, nn in zip(s, pdf[mask_col])
            ]
        return [float(v) for v in s]  # non-nullable: every NaN is a value
    if kind in ("timestamp", "timestamp_ntz"):
        return [
            None if pd.isna(v) else int(pd.Timestamp(v).value) // 1000
            for v in s
        ]
    if kind in ("int", "long"):
        s = s.astype("Int64")
        return [None if pd.isna(v) else int(v) for v in s]
    return [None if pd.isna(v) else v for v in s]


def _encode_block(pdf, specs, codec: str, masks: dict) -> tuple[bytes, int]:
    cols = [
        (_column_values(pdf, name, kind, masks.get(name)), kind, nullable)
        for name, kind, nullable in specs
    ]
    out = bytearray()
    n = len(pdf)
    for i in range(n):
        for vals, kind, nullable in cols:
            v = vals[i]
            if nullable:
                if v is None:
                    _enc_long(out, 0)
                    continue
                _enc_long(out, 1)
            elif v is None:
                raise ValueError("null in non-nullable avro field")
            if kind == "boolean":
                out.append(1 if v else 0)
            elif kind in ("int", "long", "timestamp", "timestamp_ntz"):
                _enc_long(out, int(v))
            elif kind == "float":
                out += struct.pack("<f", float(v))
            elif kind == "double":
                out += struct.pack("<d", float(v))
            elif kind == "string":
                _enc_bytes(out, str(v).encode("utf-8"))
            else:  # bytes
                _enc_bytes(out, bytes(v))
    data = bytes(out)
    if codec == "deflate":
        data = zlib.compress(data)[2:-4]  # raw deflate per spec
    return data, n


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite", codec: str = "null"
) -> int:
    """Write ``df`` as a directory of Avro OCF part files (one per
    input partition; one Avro block per Arrow batch). Returns the total
    row count from the write manifest."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    if mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.isdir(path):
        raise ValueError(f"path exists and mode={mode!r}")
    os.makedirs(path, exist_ok=True)
    schema = df.schema
    specs = [(f.name, _kind(f.dataType), f.nullable) for f in schema.fields]
    meta_schema = json.dumps(avro_schema_for(schema)).encode()
    # JVM-side not-null masks for nullable float/double columns: the
    # Arrow->pandas hop hands floats over as float64 where NULL and NaN
    # are the same bit pattern, so null-ness must be computed before it.
    masks = {
        name: f"__nn_{i}"
        for i, (name, kind, nullable) in enumerate(specs)
        if nullable and kind in ("float", "double")
    }
    from pyspark.sql import functions as F

    df = df.select(
        "*",
        *[F.col(c).isNotNull().alias(m) for c, m in masks.items()],
    )

    def write_part(batches: Iterator) -> Iterator:
        import pandas as pd

        sync = os.urandom(16)
        fh = None
        fname = ""
        n_total = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fh is None:
                fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
                header = bytearray(MAGIC)
                _enc_long(header, 2)  # metadata map: one block, 2 pairs
                _enc_bytes(header, b"avro.schema")
                _enc_bytes(header, meta_schema)
                _enc_bytes(header, b"avro.codec")
                _enc_bytes(header, codec.encode())
                header.append(0)  # end of map
                fh = open(fname, "wb")
                fh.write(bytes(header) + sync)
            data, n = _encode_block(pdf, specs, codec, masks)
            head = bytearray()
            _enc_long(head, n)
            _enc_long(head, len(data))
            fh.write(bytes(head) + data + sync)
            n_total += n
        if fh is not None:
            fh.close()
        yield pd.DataFrame({"file": [fname], "n_rows": [n_total]})

    manifest = df.mapInPandas(write_part, "file string, n_rows long").collect()
    return sum(r.n_rows for r in manifest)


# --- read ----------------------------------------------------------------


def _parse_header(buf: bytes) -> tuple[dict, str, bytes, int]:
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _read_long(buf, pos)
        if count == 0:
            break
        if count < 0:  # size-prefixed variant per spec
            _size, pos = _read_long(buf, pos)
            count = -count
        for _ in range(count):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf[pos : pos + 16]
    return schema, codec, sync, pos + 16


def _writer_specs(schema: dict) -> list[tuple[str, str, bool]]:
    if schema.get("type") != "record":
        raise ValueError("avro_ocf reads top-level records only")
    specs = []
    for f in schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union {t!r}")
            t = t[0] if t[1] == "null" else t[1]
            nullable = True
        if isinstance(t, dict):
            lt = t.get("logicalType", "")
            if lt == "timestamp-micros":
                kind = "timestamp"
            elif lt == "local-timestamp-micros":
                kind = "timestamp_ntz"
            else:
                kind = t["type"]
        else:
            kind = t
        if kind not in (
            "boolean", "int", "long", "float", "double", "string",
            "bytes", "timestamp", "timestamp_ntz",
        ):
            raise ValueError(f"unsupported avro type {t!r}")
        specs.append((f["name"], kind, nullable))
    return specs


def _decode_file(buf: bytes) -> tuple[list[tuple[str, str, bool]], list[list]]:
    schema, codec, sync, pos = _parse_header(buf)
    specs = _writer_specs(schema)
    cols: list[list] = [[] for _ in specs]
    end = len(buf)
    while pos < end:
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        data = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro block sync mismatch (corrupt file)")
        pos += 16
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        p = 0
        for _ in range(count):
            for ci, (_name, kind, nullable) in enumerate(specs):
                if nullable:
                    idx, p = _read_long(data, p)
                    if idx == 0:
                        cols[ci].append(None)
                        continue
                if kind == "boolean":
                    cols[ci].append(bool(data[p]))
                    p += 1
                elif kind in ("int", "long", "timestamp", "timestamp_ntz"):
                    v, p = _read_long(data, p)
                    cols[ci].append(v)
                elif kind == "float":
                    cols[ci].append(struct.unpack_from("<f", data, p)[0])
                    p += 4
                elif kind == "double":
                    cols[ci].append(struct.unpack_from("<d", data, p)[0])
                    p += 8
                elif kind == "string":
                    b, p = _read_bytes(data, p)
                    cols[ci].append(b.decode("utf-8"))
                else:  # bytes
                    b, p = _read_bytes(data, p)
                    cols[ci].append(bytearray(b))
    return specs, cols


def read_avro(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Distributed OCF read: binaryFile scan + per-file block decode.
    ``schema`` is explicit (files.py policy: no inference pass); field
    names must match the writer schema embedded in each file."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    want = {f.name: _kind(f.dataType) for f in schema.fields}
    want_nullable = {f.name: f.nullable for f in schema.fields}
    names = [f.name for f in schema.fields]

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                specs, cols = _decode_file(bytes(content))
                got = {name: kind for name, kind, _ in specs}
                if got != want:
                    raise ValueError(
                        f"avro schema mismatch: file has {got}, reader "
                        f"asked for {want}"
                    )
                for name, _kind_, file_nullable in specs:
                    if file_nullable and not want_nullable[name]:
                        raise ValueError(
                            f"avro nullability mismatch: file field "
                            f"{name!r} is nullable but the reader schema "
                            f"declares it non-nullable"
                        )
                by_name = {name: c for (name, _k, _n), c in zip(specs, cols)}
                out = {}
                for name in names:
                    kind = want[name]
                    c = by_name[name]
                    if kind in ("timestamp", "timestamp_ntz"):
                        out[name] = pd.to_datetime(
                            pd.Series(c, dtype="object"), unit="us"
                        )
                    elif kind in ("float", "double"):
                        # masked FloatingArray: NaN stays a VALUE (the
                        # mask, not the bit pattern, marks nulls) and the
                        # pandas->Arrow hop honors the mask, so a stored
                        # NaN round-trips instead of collapsing to null.
                        vals = np.array(
                            [float("nan") if v is None else v for v in c],
                            dtype="float64",
                        )
                        mask = np.array([v is None for v in c], dtype=bool)
                        out[name] = pd.Series(
                            pd.arrays.FloatingArray(vals, mask)
                        )
                    else:
                        out[name] = pd.Series(c, dtype="object")
                yield pd.DataFrame(out, columns=names)

    return files.mapInPandas(decode, schema)
