"""Minimal Avro Object Container File reader (and writer, for tests).

Exists because Iceberg's manifest files are Avro and this container ships
no avro/fastavro package. Implements exactly the subset the Iceberg
metadata layer needs, straight from the public Avro 1.11 spec
(https://avro.apache.org/docs/1.11.1/specification/):

- container framing: `Obj\\x01` magic, file-metadata map (schema JSON +
  codec), 16-byte sync marker, then (count, byte-size, payload, sync)
  blocks;
- codecs: null and deflate (raw zlib, stdlib);
- datum types: null boolean int long float double bytes string record
  enum array map union fixed. Logical types are returned as their raw
  physical value (timestamps stay integers — the Iceberg layer does not
  need them decoded).

Driver-side and metadata-sized by design: manifests are O(#data files),
the same material every Iceberg reader's snapshot build parses. Data
files themselves are parquet and go through the normal distributed scan.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, BinaryIO

_MAGIC = b"Obj\x01"


# ----------------------------------------------------------- primitives ----


def _read_long(buf: BinaryIO) -> int:
    """Zigzag varint — the long/int wire format."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("truncated bytes")
    return out


def _read_datum(buf: BinaryIO, schema: Any, named: dict[str, Any]) -> Any:
    """Decode one datum per the WRITER schema (no reader-schema resolution —
    we always read with the file's own schema)."""
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    if isinstance(schema, list):  # union: branch index then datum
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _read_datum(buf, schema[idx], named)
    if isinstance(schema, dict):
        t = schema["type"]
    else:
        t = schema
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated boolean")
        return b[0] == 1
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        _register_named(schema, named)
        return buf.read(schema["size"])
    if t == "enum":
        _register_named(schema, named)
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        _register_named(schema, named)
        return {
            f["name"]: _read_datum(buf, f["type"], named) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # negative count ⇒ block byte-size follows (skippable)
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_read_datum(buf, schema["items"], named))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _read_datum(buf, schema["values"], named)
        return out
    raise NotImplementedError(f"avro type {t!r} not supported by avro_lite")


def _register_named(schema: dict, named: dict[str, Any]) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        named[name] = schema
        if ns:
            named[f"{ns}.{name}"] = schema


def read_container(path: str) -> list[dict]:
    """Read every record of an Avro Object Container File into plain dicts."""
    return _read_container(path)[1]


def read_container_with_schema(path: str) -> tuple[dict, list[dict]]:
    """Like :func:`read_container` but also returns the file's WRITER
    schema (the ``avro.schema`` header, parsed). Iceberg resolves AVRO
    data-file columns by the ``field-id`` attributes the writer stamped
    on each record field — that attribute lives only in the writer
    schema, so field-id-safe readers need it exposed."""
    return _read_container(path)


def count_container_records(path: str) -> int:
    """Total record count of an Avro container from the BLOCK HEADERS
    alone — each block leads with (count, byte-size), so the payload is
    seeked past, never decoded. O(#blocks) IO: the cheap cardinality
    probe join-strategy decisions need (the Avro twin of a parquet
    footer's num_rows)."""
    with open(path, "rb") as fh:
        if fh.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        while True:
            n = _read_long(fh)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(fh)
            for _ in range(n):
                _read_bytes(fh)  # key
                _read_bytes(fh)  # value
        fh.read(16)  # sync marker
        total = 0
        while True:
            head = fh.read(1)
            if not head:
                return total
            fh.seek(-1, 1)
            total += _read_long(fh)
            fh.seek(_read_long(fh), 1)  # skip payload bytes
            if len(fh.read(16)) != 16:
                raise ValueError(f"{path}: truncated block (corrupt file)")


def _read_container(path: str) -> tuple[dict, list[dict]]:
    with open(path, "rb") as fh:
        if fh.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta: dict[str, bytes] = {}
        while True:
            n = _read_long(fh)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(fh)
            for _ in range(n):
                k = _read_bytes(fh).decode("utf-8")
                meta[k] = _read_bytes(fh)
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise NotImplementedError(f"{path}: avro codec {codec!r} unsupported")
        sync = fh.read(16)
        named: dict[str, Any] = {}
        out: list[dict] = []
        while True:
            head = fh.read(1)
            if not head:
                break  # clean EOF
            fh.seek(-1, 1)
            count = _read_long(fh)
            payload = _read_bytes(fh)  # block byte-size then data
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            block = io.BytesIO(payload)
            for _ in range(count):
                out.append(_read_datum(block, schema, named))
            if fh.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        return schema, out


# ---------------------------------------------------------------- writer ----
# Used to BUILD test fixtures (and by any pipeline needing to emit
# Iceberg-compatible manifests). Kept symmetric with the reader but the
# reader is additionally unit-tested against hand-computed byte vectors so
# the pair can't be wrong together.


def _write_long(buf: BinaryIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _write_bytes(buf: BinaryIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _write_datum(buf: BinaryIO, datum: Any, schema: Any, named: dict) -> None:
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    if isinstance(schema, list):
        for idx, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (datum is None) == (bt == "null"):
                _write_long(buf, idx)
                _write_datum(buf, datum, branch, named)
                return
        raise ValueError(f"no union branch for {datum!r}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, datum)
    elif t == "float":
        buf.write(struct.pack("<f", datum))
    elif t == "double":
        buf.write(struct.pack("<d", datum))
    elif t == "bytes":
        _write_bytes(buf, datum)
    elif t == "string":
        _write_bytes(buf, datum.encode("utf-8"))
    elif t == "fixed":
        _register_named(schema, named)
        buf.write(datum)
    elif t == "enum":
        _register_named(schema, named)
        _write_long(buf, schema["symbols"].index(datum))
    elif t == "record":
        _register_named(schema, named)
        for f in schema["fields"]:
            _write_datum(buf, datum.get(f["name"]), f["type"], named)
    elif t == "array":
        if datum:
            _write_long(buf, len(datum))
            for item in datum:
                _write_datum(buf, item, schema["items"], named)
        _write_long(buf, 0)
    elif t == "map":
        if datum:
            _write_long(buf, len(datum))
            for k, v in datum.items():
                _write_bytes(buf, k.encode("utf-8"))
                _write_datum(buf, v, schema["values"], named)
        _write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r} not supported by avro_lite")


def _varint_stream(vals, nulls):
    """Vectorized zigzag-varint encode of an int64 array: returns
    ``(flat_bytes_uint8, per_row_len_int64)`` where null rows contribute
    zero bytes. All arithmetic is numpy-wide; the boolean-mask selection
    at the end walks the (n, 10) byte matrix row-major, so the flat
    stream is already in row order."""
    import numpy as np

    v = np.asarray(vals, dtype=np.int64)
    zz = ((v << np.int64(1)) ^ (v >> np.int64(63))).astype(np.uint64)
    nb = np.ones(len(zz), dtype=np.int64)
    for k in range(1, 10):
        nb += (zz >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    mat = np.empty((len(zz), 10), dtype=np.uint8)
    cur = zz.copy()
    for k in range(10):
        mat[:, k] = (cur & np.uint64(0x7F)).astype(np.uint8)
        cur >>= np.uint64(7)
    mat |= (
        (np.arange(10)[None, :] < (nb - 1)[:, None]).astype(np.uint8) << 7
    )
    nb = np.where(np.asarray(nulls, dtype=bool), 0, nb)
    flat = mat[np.arange(10)[None, :] < nb[:, None]]
    return flat, nb


def _fixed_stream(raw_bytes, width, nulls):
    """Fixed-width payload (float/double/boolean) as a row-order stream:
    ``raw_bytes`` is the dense little-endian buffer of ALL rows (null
    rows hold don't-care bytes); null rows get length 0 and their bytes
    masked out."""
    import numpy as np

    n = len(nulls)
    mat = np.frombuffer(raw_bytes, dtype=np.uint8).reshape(n, width)
    nulls = np.asarray(nulls, dtype=bool)
    lens = np.where(nulls, 0, width).astype(np.int64)
    flat = mat[~nulls].reshape(-1)
    return flat, lens


def write_container_columnar(path: str, schema: dict, columns: list) -> None:
    """Vectorized writer for FLAT nullable-primitive record schemas — the
    batch-encode fast path for Iceberg AVRO data files (the per-row
    :func:`write_container` stays for manifests and nested fixtures).

    ``columns`` aligns with ``schema['fields']``: one
    ``(phys_values, null_mask, avro_primitive)`` triple per field, where
    ``avro_primitive`` ∈ {int, long, float, double, boolean, string} and
    ``phys_values`` already holds the PHYSICAL encoding (days ints for
    dates, micros longs for timestamps). Every field must be the
    ``["null", X]`` union our stager writes.

    Encoding identity with the row writer is bit-exact by construction:
    per row and field, a 1-byte union index (0x00 null / 0x02 value)
    followed by the same primitive wire bytes; the whole batch lands as
    ONE container block, exactly like write_container. Assembly is a
    numpy scatter — per (field, substream), target positions are
    row_start + within-row offset, so no Python-level per-row loop ever
    runs."""
    import numpy as np

    fields = schema["fields"]
    if len(columns) != len(fields):
        raise ValueError("columns must align with schema fields")
    n = len(columns[0][1]) if columns else 0
    streams: list = []  # (flat uint8, lens int64) in row-interleave order
    for (vals, nulls, prim), f in zip(columns, fields):
        t = f["type"]
        if not (isinstance(t, list) and len(t) == 2 and t[0] == "null"):
            raise ValueError(
                f"write_container_columnar: field {f['name']!r} is not a "
                "['null', primitive] union"
            )
        nulls = np.asarray(nulls, dtype=bool)
        # union branch index: varint 0 (b'\x00') for null, 1 (b'\x02')
        prefix = np.where(nulls, 0x00, 0x02).astype(np.uint8)
        streams.append((prefix, np.ones(n, dtype=np.int64)))
        if prim in ("int", "long"):
            streams.append(_varint_stream(vals, nulls))
        elif prim == "float":
            buf = np.ascontiguousarray(
                np.asarray(vals, dtype="<f4")
            ).tobytes()
            streams.append(_fixed_stream(buf, 4, nulls))
        elif prim == "double":
            buf = np.ascontiguousarray(
                np.asarray(vals, dtype="<f8")
            ).tobytes()
            streams.append(_fixed_stream(buf, 8, nulls))
        elif prim == "boolean":
            buf = np.asarray(vals, dtype=bool).astype(np.uint8).tobytes()
            streams.append(_fixed_stream(buf, 1, nulls))
        elif prim == "string":
            enc = [
                b"" if isnull else str(v).encode("utf-8")
                for v, isnull in zip(vals, nulls)
            ]
            blens = np.fromiter(
                (len(b) for b in enc), dtype=np.int64, count=n
            )
            streams.append(_varint_stream(blens, nulls))
            body = np.frombuffer(b"".join(enc), dtype=np.uint8)
            streams.append((body, np.where(nulls, 0, blens)))
        else:
            raise NotImplementedError(
                f"write_container_columnar: primitive {prim!r} unsupported"
            )
    row_len = np.zeros(n, dtype=np.int64)
    for _flat, lens in streams:
        row_len += lens
    row_start = np.zeros(n, dtype=np.int64)
    np.cumsum(row_len[:-1], out=row_start[1:])
    out = np.empty(int(row_len.sum()), dtype=np.uint8)
    within = np.zeros(n, dtype=np.int64)
    for flat, lens in streams:
        total = int(lens.sum())
        if total:
            starts = row_start + within
            cum_excl = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=cum_excl[1:])
            pos = np.repeat(starts - cum_excl, lens) + np.arange(total)
            out[pos] = flat
        within += lens
    body = out.tobytes()
    sync = b"\x00" * 8 + b"avrolite"
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null",
        }
        _write_long(fh, len(meta))
        for k, v in meta.items():
            _write_bytes(fh, k.encode())
            _write_bytes(fh, v)
        _write_long(fh, 0)
        fh.write(sync)
        if n:
            _write_long(fh, n)
            _write_bytes(fh, body)
            fh.write(sync)


def write_container(path: str, schema: dict, records: list[dict]) -> None:
    """Write records as a (null-codec) Avro object container file."""
    sync = b"\x00" * 8 + b"avrolite"  # any 16 bytes
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
        _write_long(fh, len(meta))
        for k, v in meta.items():
            _write_bytes(fh, k.encode())
            _write_bytes(fh, v)
        _write_long(fh, 0)
        fh.write(sync)
        if records:
            body = io.BytesIO()
            named: dict[str, Any] = {}
            for r in records:
                _write_datum(body, r, schema, named)
            _write_long(fh, len(records))
            _write_bytes(fh, body.getvalue())
            fh.write(sync)
