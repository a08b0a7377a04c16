"""Puffin statistics files — the Iceberg spec's container for table-level
secondary statistics ("Puffin file format" + table-spec §Table Statistics;
reference parity: the reference has no stats subsystem, this is [EXT]
surface for CBO-grade planning over path-based Iceberg reads).

A Puffin file is ``Magic Blob₁…Blobₙ Footer`` where Footer is
``Magic FooterPayload FooterPayloadSize(int32 LE) Flags(4B) Magic`` and
FooterPayload is UTF-8 JSON ``{"blobs": [...], "properties": {...}}``.
Each blob-metadata record carries ``type``, ``fields`` (source field ids),
``snapshot-id``, ``sequence-number``, ``offset``, ``length`` and free-form
``properties`` — for the NDV blob type ``apache-datasketches-theta-v1``
the spec stores the estimate itself under properties["ndv"], which is the
value engines (Trino, Spark) actually consult for planning; the sketch
payload exists so estimates stay MERGEABLE across partial analyzes.

Sketch payload: a KMV (k-minimum-values) theta sketch serialized in the
DataSketches COMPACT layout (serial version 3, family 3): preamble long
``preLongs | serVer<<8 | famId<<16 | flags<<40 | seedHash<<48``, then
``curCount(int32) p(float32)`` when non-empty, ``thetaLong`` when in
estimation mode, then the retained ordered hash values. One honest caveat,
stated here rather than hidden: values are hashed with Spark's xxhash64
(JVM-side, one whole-stage-codegen pass) instead of DataSketches'
murmur3-128, so a foreign DataSketches reader would parse the container
and layout fine but merge/estimate against different hash coordinates —
interop consumers should (and per the Iceberg spec, do) read
properties["ndv"]. Within this engine the sketches are fully mergeable.
"""

from __future__ import annotations

import json
import os
import struct

MAGIC = b"PFA1"
BLOB_TYPE_THETA = "apache-datasketches-theta-v1"
#: Iceberg v3 deletion vector blob (table spec §Position Delete Files /
#: Puffin spec `deletion-vector-v1`): payload is the Delta-framed
#: 64-bit RoaringBitmapArray (io/roaring.frame_dv_blob), one blob per
#: referenced data file, `referenced-data-file` + `cardinality` in the
#: blob properties.
BLOB_TYPE_DV = "deletion-vector-v1"

#: hash domain is [0, 2^63) like DataSketches (signed-long safe)
_MAX63 = (1 << 63) - 1
DEFAULT_K = 4096

_SER_VER = 3
_FAMILY_COMPACT = 3
# flags bits: 1=BIG_ENDIAN 2=READ_ONLY 4=EMPTY 8=COMPACT 16=ORDERED
_FLAGS_BASE = 2 | 8 | 16
_FLAG_EMPTY = 4
#: stamped where DataSketches puts the seed hash; derived from our hash
#: convention (xxhash64 domain), NOT murmur3(9001) — see module docstring
_SEED_HASH = 0xFEED


class ThetaSketch:
    """Compact KMV theta sketch: ``retained`` ordered hash values all
    strictly below ``theta_long``. Exact mode when theta_long == 2^63
    (every distinct hash seen is retained); estimation mode otherwise with
    estimate = retained * 2^63 / theta_long."""

    def __init__(self, retained: list[int], theta_long: int = 1 << 63):
        self.retained = sorted(retained)
        self.theta_long = theta_long

    @property
    def is_empty(self) -> bool:
        return not self.retained and self.theta_long == (1 << 63)

    @property
    def estimate(self) -> int:
        if self.theta_long == (1 << 63):
            return len(self.retained)
        return int(round(len(self.retained) * (1 << 63) / self.theta_long))

    @classmethod
    def from_smallest_hashes(cls, hashes: list[int], k: int = DEFAULT_K):
        """Build from the ≤ k+1 SMALLEST distinct hash values of a column
        (the caller's TakeOrdered output). ≤ k values → exact mode; k+1
        values → estimation mode with theta at the (k+1)-th order
        statistic and the k below it retained (the classic KMV
        estimator)."""
        hs = sorted(set(hashes))
        if len(hs) <= k:
            return cls(hs)
        return cls(hs[:k], theta_long=hs[k])

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """Union: keep values below the smaller theta, re-truncate to the
        larger retained budget — how partial-analyze sketches combine."""
        theta = min(self.theta_long, other.theta_long)
        vals = sorted(
            {v for v in self.retained + other.retained if v < theta}
        )
        k = max(len(self.retained), len(other.retained))
        if theta == (1 << 63) or len(vals) <= k:
            return ThetaSketch(vals, theta)
        return ThetaSketch(vals[:k], theta_long=vals[k])

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        """Intersection: both sketches are uniform samples of their sets
        below their thetas, so values retained by BOTH below min(theta)
        sample the intersection at that same rate — the standard theta
        set operation, used for join-key overlap estimation."""
        theta = min(self.theta_long, other.theta_long)
        mine = set(self.retained)
        vals = sorted(
            v for v in other.retained if v in mine and v < theta
        )
        return ThetaSketch(vals, theta)

    def serialize(self) -> bytes:
        flags = _FLAGS_BASE | (_FLAG_EMPTY if self.is_empty else 0)
        est_mode = self.theta_long != (1 << 63)
        pre_longs = 1 if self.is_empty else (3 if est_mode else 2)
        long0 = (
            pre_longs
            | (_SER_VER << 8)
            | (_FAMILY_COMPACT << 16)
            | (flags << 40)
            | (_SEED_HASH << 48)
        )
        out = struct.pack("<Q", long0)
        if self.is_empty:
            return out
        out += struct.pack("<if", len(self.retained), 1.0)
        if est_mode:
            out += struct.pack("<q", self.theta_long)
        out += struct.pack(f"<{len(self.retained)}q", *self.retained)
        return out

    @classmethod
    def deserialize(cls, blob: bytes) -> "ThetaSketch":
        (long0,) = struct.unpack_from("<Q", blob, 0)
        pre_longs = long0 & 0xFF
        ser_ver = (long0 >> 8) & 0xFF
        family = (long0 >> 16) & 0xFF
        flags = (long0 >> 40) & 0xFF
        if ser_ver != _SER_VER or family != _FAMILY_COMPACT:
            raise ValueError(
                f"not a compact theta sketch (serVer={ser_ver}, family={family})"
            )
        if flags & _FLAG_EMPTY:
            return cls([])
        (count,) = struct.unpack_from("<i", blob, 8)
        theta = 1 << 63
        off = 16
        if pre_longs == 3:
            (theta,) = struct.unpack_from("<q", blob, 16)
            off = 24
        retained = list(struct.unpack_from(f"<{count}q", blob, off))
        return cls(retained, theta_long=theta)


def column_sketches(df, columns: list[str], k: int = DEFAULT_K) -> dict:
    """One KMV theta sketch per column: hash JVM-side with xxhash64 into
    [0, 2^63), then take the k+1 smallest DISTINCT hashes per column —
    Catalyst plans distinct → TakeOrderedAndProject, so each column costs
    one shuffle-bounded pass collecting at most k+1 longs to the driver
    (the same cost class as ANALYZE ... FOR COLUMNS). Nulls don't count
    toward NDV, per SQL semantics."""
    from pyspark.sql import functions as F

    out = {}
    for c in columns:
        rows = (
            df.where(F.col(c).isNotNull())
            .select(
                F.xxhash64(F.col(c)).bitwiseAND(F.lit(_MAX63)).alias("h")
            )
            .distinct()
            .orderBy("h")
            .limit(k + 1)
            .collect()
        )
        out[c] = ThetaSketch.from_smallest_hashes([r.h for r in rows], k)
    return out


def write_puffin(
    path: str,
    blobs: list[tuple[dict, bytes]],
    properties: dict | None = None,
) -> dict:
    """Write a Puffin file: ``blobs`` is [(blob-metadata-sans-offsets,
    payload)] — offset/length are filled in here. Returns
    {"file-size-in-bytes", "file-footer-size-in-bytes", "blob-metadata"}
    — exactly the fields the table-metadata statistics entry needs."""
    metas = []
    body = bytearray(MAGIC)
    for meta, payload in blobs:
        metas.append({**meta, "offset": len(body), "length": len(payload)})
        body += payload
    payload_json = json.dumps(
        {"blobs": metas, "properties": properties or {}}
    ).encode("utf-8")
    footer = (
        MAGIC
        + payload_json
        + struct.pack("<i", len(payload_json))
        + b"\x00\x00\x00\x00"  # flags: footer payload uncompressed
        + MAGIC
    )
    with open(path, "wb") as fh:
        fh.write(bytes(body) + footer)
    return {
        "file-size-in-bytes": len(body) + len(footer),
        "file-footer-size-in-bytes": len(footer),
        "blob-metadata": metas,
    }


def read_puffin(path: str) -> tuple[list[dict], dict]:
    """Read a Puffin file → ([blob-metadata with inline 'payload' bytes],
    file properties). Fail-loud on bad magic or a compressed footer (this
    writer never compresses; a foreign lz4 footer needs a codec this
    container doesn't ship)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad magic)")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise ValueError(
            f"{path}: lz4-compressed Puffin footer — unsupported here"
        )
    (payload_size,) = struct.unpack_from("<i", data, len(data) - 12)
    payload_start = len(data) - 12 - payload_size
    if data[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError(f"{path}: corrupt Puffin footer framing")
    doc = json.loads(data[payload_start : payload_start + payload_size])
    blobs = []
    for m in doc.get("blobs", []):
        off, ln = int(m["offset"]), int(m["length"])
        blobs.append({**m, "payload": data[off : off + ln]})
    return blobs, doc.get("properties", {})
