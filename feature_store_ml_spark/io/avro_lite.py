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


def read_container_columnar(path: str):
    """Vectorized COLUMNAR decode of a flat nullable-primitive container
    — the read twin of :func:`write_container_columnar` and the fast
    path for Iceberg AVRO data files. Returns ``(writer_schema, cols,
    n)`` where ``cols[name] = (values, null_mask)``: numpy int64 for
    int/long (and their logical types, physical values), float64 for
    float/double, bool for boolean, object (str) for string — null rows
    hold don't-care values under a True mask.

    Decode is TWO-PASS: a SCHEMA-SPECIALIZED generated skip-pass (the
    decoder's whole-stage codegen — one exec-compiled function per
    field layout, append-bound locals, no per-field dispatch or value
    boxing) walks the byte stream once recording per-field
    offsets/lengths of live rows; numpy then extracts every column in
    bulk — varints via an (n, 10) gather + 7-bit accumulation,
    fixed-width floats via reshape/view, strings via one row-order byte
    gather into a pyarrow StringArray. Raises ValueError for any schema
    outside the flat ``["null", primitive]`` shape or a non-canonical
    union index — callers fall back to
    :func:`read_container_with_schema`."""
    import numpy as np

    with open(path, "rb") as fh:
        if fh.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta: dict[str, bytes] = {}
        while True:
            nkv = _read_long(fh)
            if nkv == 0:
                break
            if nkv < 0:
                nkv = -nkv
                _read_long(fh)
            for _ in range(nkv):
                k = _read_bytes(fh).decode("utf-8")
                meta[k] = _read_bytes(fh)
        # every "unsupported shape" must exit as ValueError — the
        # callers' columnar->row fallback catches exactly that type, so
        # a KeyError (missing avro.schema) or AttributeError (non-dict
        # top-level schema) would crash the scan instead of degrading
        if "avro.schema" not in meta:
            raise ValueError(f"{path}: container missing avro.schema header")
        try:
            schema = json.loads(meta["avro.schema"])
        except Exception as exc:
            raise ValueError(f"{path}: unparsable avro.schema: {exc}") from exc
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise NotImplementedError(f"{path}: avro codec {codec!r} unsupported")
        sync = fh.read(16)
        if not isinstance(schema, dict):
            raise ValueError("not a flat record schema")
        fields = schema.get("fields")
        if schema.get("type") != "record" or not fields:
            raise ValueError("not a flat record schema")
        # kind codes: 0 = varint, 1 = fixed(width), 2 = string
        kinds: list[tuple[int, int, str]] = []
        for f in fields:
            if not isinstance(f, dict):
                raise ValueError("field entry is not a record-field object")
            t = f.get("type")
            if not (isinstance(t, list) and len(t) == 2 and t[0] == "null"):
                raise ValueError("field is not a ['null', primitive] union")
            prim = t[1]
            if isinstance(prim, dict):
                prim = prim.get("type")
            if prim in ("int", "long"):
                kinds.append((0, 0, prim))
            elif prim == "float":
                kinds.append((1, 4, prim))
            elif prim == "double":
                kinds.append((1, 8, prim))
            elif prim == "boolean":
                kinds.append((1, 1, prim))
            elif prim == "string":
                kinds.append((2, 0, prim))
            else:
                raise ValueError(f"primitive {prim!r} not columnar-decodable")
        blocks: list[tuple[bytes, int]] = []
        total = 0
        while True:
            head = fh.read(1)
            if not head:
                break
            fh.seek(-1, 1)
            cnt = _read_long(fh)
            payload = _read_bytes(fh)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            if fh.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
            blocks.append((payload, cnt))
            total += cnt

    scan = _compiled_scan(tuple((c, w) for c, w, _p in kinds))
    rowlens = meta.get("fsml.rowlens")
    chunks: list[dict] = []
    base = 0
    for payload, cnt in blocks:
        triples = None
        if rowlens is not None and len(rowlens) == 4 * total:
            # vectorized scan: the writer's per-record byte lengths give
            # record starts for free; every field decodes in lockstep
            # across all records, zero per-record python. Any
            # inconsistency (foreign rewrite, corrupt sidecar) falls
            # back to the compiled scalar scan.
            rl = np.frombuffer(rowlens, dtype="<u4")[
                base : base + cnt
            ].astype(np.int64)
            if int(rl.sum()) == len(payload):
                starts0 = np.zeros(cnt, dtype=np.int64)
                np.cumsum(rl[:-1], out=starts0[1:])
                try:
                    triples = _scan_vector(
                        np, np.frombuffer(payload, dtype=np.uint8),
                        starts0, rl, kinds,
                    )
                except ValueError:
                    triples = None
        if triples is None:
            triples = _scan_scalar(np, payload, cnt, kinds, scan)
        chunks.append(
            _extract_block(np, payload, cnt, kinds, fields, triples)
        )
        base += cnt
    cols: dict = {}
    for f in fields:
        name = f["name"]
        if len(chunks) == 1:
            cols[name] = chunks[0][name]
        else:
            vs = np.concatenate([c[name][0] for c in chunks])
            ms = np.concatenate([c[name][1] for c in chunks])
            cols[name] = (vs, ms)
    return schema, cols, total


_SCAN_CACHE: dict = {}


def _compiled_scan(layout: tuple):
    """exec-compile the scalar skip-pass for one field LAYOUT (kind/width
    tuple): per record, per field, append the null flag and (for live
    rows) the value offset/length — nothing else. Append methods are
    bound locals; there is no per-field dispatch, loop, or boxing. The
    compiled function is cached per layout (schemas repeat across files
    and blocks). This is the FOREIGN-FILE path; files our own writer
    produced carry the fsml.rowlens sidecar and take the fully
    vectorized :func:`_scan_vector` instead."""
    fn = _SCAN_CACHE.get(layout)
    if fn is not None:
        return fn
    lines = ["def _scan(mv, cnt, A):", "    c = 0"]
    names = []
    for f in range(len(layout)):
        names += [f"n{f}", f"s{f}", f"l{f}"]
    lines.append(f"    {', '.join(names)} = A")
    lines.append("    for _ in range(cnt):")
    for f, (code, w) in enumerate(layout):
        lines.append("        b = mv[c]; c += 1")
        lines.append("        if b == 0:")
        lines.append(f"            n{f}(True)")
        lines.append("        elif b != 2:")
        lines.append(
            "            raise ValueError('non-canonical union index')"
        )
        lines.append("        else:")
        lines.append(f"            n{f}(False)")
        if code == 0:
            lines.append("            s = c")
            lines.append("            while mv[c] & 128: c += 1")
            lines.append("            c += 1")
            lines.append(f"            s{f}(s); l{f}(c - s)")
        elif code == 1:
            lines.append(f"            s{f}(c); c += {w}")
        else:
            lines.append("            zz = 0; sh = 0")
            lines.append("            while True:")
            lines.append("                y = mv[c]; c += 1")
            lines.append("                zz |= (y & 127) << sh")
            lines.append("                if not y & 128: break")
            lines.append("                sh += 7")
            lines.append("            ln = (zz >> 1) ^ -(zz & 1)")
            lines.append(f"            s{f}(c); l{f}(ln); c += ln")
    lines.append("    return c")
    ns: dict = {}
    exec("\n".join(lines), ns)  # noqa: S102 — generated from the layout only
    fn = ns["_scan"]
    _SCAN_CACHE[layout] = fn
    return fn


def _scan_scalar(np, payload: bytes, cnt: int, kinds, scan):
    """Run the compiled scalar skip-pass and densify its compact
    per-live-row offset lists into the full-length (nulls, starts,
    lens) triples extraction consumes."""
    nf = len(kinds)
    acc: list = []
    store: list = []
    for _ in range(nf):
        nl: list = []
        sl: list = []
        ll: list = []
        store.append((nl, sl, ll))
        acc += [nl.append, sl.append, ll.append]
    scan(payload, cnt, tuple(acc))
    triples = []
    for f, (code, w, _p) in enumerate(kinds):
        nl, sl, ll = store[f]
        nulls = np.array(nl, dtype=bool) if nl else np.zeros(cnt, dtype=bool)
        live = ~nulls
        starts = np.zeros(cnt, dtype=np.int64)
        lens = np.zeros(cnt, dtype=np.int64)
        if sl:
            starts[live] = np.array(sl, dtype=np.int64)
        if code == 1:
            lens[live] = w
        elif ll:
            lens[live] = np.array(ll, dtype=np.int64)
        triples.append((nulls, starts, lens))
    return triples


def _scan_vector(np, data, rec_starts, rec_lens, kinds):
    """Fully vectorized skip-pass: with record starts known (sidecar),
    each field decodes in LOCKSTEP across all records — union prefix
    gather, varint lengths from the first clear high bit of an (n, 10)
    gather, string lengths zigzag-decoded in bulk, cursors advanced by
    vector adds. Raises ValueError on any inconsistency (non-canonical
    union byte, >10-byte varint, cursor drift vs the sidecar lengths)
    so the caller can fall back to the scalar scan."""
    n = len(rec_starts)
    dlen = len(data)
    cur = rec_starts.copy()
    ar10 = np.arange(10)
    k7 = (np.uint64(7) * ar10.astype(np.uint64))[None, :]
    triples = []
    for code, w, _prim in kinds:
        prefix = data[np.minimum(cur, dlen - 1)]
        nulls = prefix == 0
        if (~nulls & (prefix != 2)).any():
            raise ValueError("non-canonical union index")
        cur = cur + 1
        if code == 1:
            starts = np.where(nulls, 0, cur)
            lens = np.where(nulls, 0, w).astype(np.int64)
            cur = cur + lens
        else:
            idx = cur[:, None] + ar10
            m = data[np.minimum(idx, dlen - 1)]
            stop = (m & 0x80) == 0
            vlen = stop.argmax(axis=1) + 1
            if not stop.any(axis=1).all():
                raise ValueError("varint longer than 10 bytes")
            vlen = np.where(nulls, 0, vlen).astype(np.int64)
            if code == 0:
                starts = np.where(nulls, 0, cur)
                lens = vlen
                cur = cur + vlen
            else:
                keep = ar10[None, :] < vlen[:, None]
                zz = np.where(
                    keep, (m.astype(np.uint64) & np.uint64(0x7F)) << k7,
                    np.uint64(0),
                ).sum(axis=1, dtype=np.uint64)
                slen = ((zz >> np.uint64(1)).astype(np.int64)) ^ -(
                    (zz & np.uint64(1)).astype(np.int64)
                )
                slen = np.where(nulls, 0, slen)
                if (slen < 0).any():
                    raise ValueError("negative string length")
                starts = np.where(nulls, 0, cur + vlen)
                lens = slen
                cur = cur + vlen + slen
        triples.append((nulls, starts, lens))
    if not (cur == rec_starts + rec_lens).all():
        raise ValueError("cursor drift vs sidecar record lengths")
    return triples


def _extract_block(np, payload: bytes, cnt: int, kinds, fields, triples) -> dict:
    """Numpy bulk extraction from full-length (nulls, starts, lens)
    triples. Returns {name: (values, null_mask)} with live-row values
    scattered into full-length arrays."""
    data = np.frombuffer(payload, dtype=np.uint8)
    out: dict = {}
    for f, (code, w, prim) in enumerate(kinds):
        name = fields[f]["name"]
        nmask, starts, lens = triples[f]
        live = ~nmask
        st = starts[live]
        ln = lens[live]
        if prim in ("int", "long"):
            vals = np.zeros(cnt, dtype=np.int64)
            if len(st):
                idx = st[:, None] + np.arange(10)
                m = data[np.minimum(idx, len(data) - 1)].astype(np.uint64)
                k = np.arange(10, dtype=np.uint64)[None, :]
                keep = np.arange(10)[None, :] < ln[:, None]
                zz = np.where(
                    keep, (m & np.uint64(0x7F)) << (np.uint64(7) * k),
                    np.uint64(0),
                ).sum(axis=1, dtype=np.uint64)
                vals[live] = ((zz >> np.uint64(1)).astype(np.int64)) ^ -(
                    (zz & np.uint64(1)).astype(np.int64)
                )
        elif prim in ("float", "double"):
            vals = np.zeros(cnt, dtype=np.float64)
            if len(st):
                idx = st[:, None] + np.arange(w)
                raw = np.ascontiguousarray(data[idx])
                vals[live] = raw.view(
                    "<f4" if w == 4 else "<f8"
                ).reshape(-1).astype(np.float64)
        elif prim == "boolean":
            vals = np.zeros(cnt, dtype=bool)
            if len(st):
                vals[live] = data[st] == 1
        else:  # string: one row-order gather into a pyarrow StringArray
            import pyarrow as pa

            vals = np.empty(cnt, dtype=object)
            vals[:] = None
            if len(st):
                gather = np.repeat(
                    st - np.concatenate(([0], np.cumsum(ln[:-1]))), ln
                ) + np.arange(int(ln.sum()))
                body = data[gather].tobytes()
                if int(ln.sum()) < (1 << 31):
                    offs = np.zeros(len(ln) + 1, dtype=np.int32)
                    np.cumsum(ln, out=offs[1:])
                    arr = pa.StringArray.from_buffers(
                        len(ln),
                        pa.py_buffer(offs.tobytes()),
                        pa.py_buffer(body),
                    )
                else:
                    # >2 GiB of string bytes in one block: int32 offsets
                    # would overflow — use the 64-bit-offset variant
                    offs = np.zeros(len(ln) + 1, dtype=np.int64)
                    np.cumsum(ln, out=offs[1:])
                    arr = pa.LargeStringArray.from_buffers(
                        len(ln),
                        pa.py_buffer(offs.tobytes()),
                        pa.py_buffer(body),
                    )
                vals[live] = np.asarray(arr.to_pandas(), dtype=object)
        out[name] = (vals, nmask)
    return out


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


def write_container_columnar(
    path: str, schema: dict, columns: list, codec: str = "null"
) -> None:
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
    if codec not in ("null", "deflate"):
        raise ValueError(f"write_container_columnar: codec {codec!r}")
    if codec == "deflate":
        # avro deflate = raw DEFLATE stream (no zlib header), spec §Codecs
        _c = zlib.compressobj(wbits=-15)
        body = _c.compress(body) + _c.flush()
    sync = b"\x00" * 8 + b"avrolite"
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        if n and bool(int(row_len.max()) < (1 << 32)):
            # SIDECAR (spec-legal custom file-metadata key, ignored by
            # foreign readers): per-record byte lengths as raw LE u32 —
            # the writer knows them for free, and they are exactly what
            # makes the columnar READ fully vectorizable (record starts
            # = exclusive cumsum; every field then decodes in lockstep
            # across all records with no per-record python). ~4 B/row.
            meta["fsml.rowlens"] = row_len.astype("<u4").tobytes()
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
