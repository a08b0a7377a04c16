"""Pure-python portable RoaringBitmap codec + Z85 + the Delta deletion
vector blob format (SURVEY.md §2B E1 stretch — modern-Delta row-level
deletes; the reference has no lakehouse surface).

Everything here is from PUBLIC specs:

- 32-bit roaring "portable" serialization: the RoaringFormatSpec
  (github.com/RoaringBitmap/RoaringFormatSpec) — cookie, descriptive
  headers, offset headers, array/bitmap/run containers.
- 64-bit extension: Delta's RoaringBitmapArray "portable" layout
  (delta-io PROTOCOL.md §Deletion Vector Format): an 8-byte little-endian
  bitmap count followed by that many 32-bit portable bitmaps, the i-th
  holding the low 32 bits of values whose high 32 bits equal i.
- Z85 (ZeroMQ spec 32, rfc.zeromq.org/spec/32): the ascii85 variant Delta
  uses for inline DVs and DV-file UUIDs.
- DV blob framing (PROTOCOL.md): [dataSize: int32 BE][magic 1681511377:
  int32 LE][portable bitmap bytes][CRC-32 of magic+bitmap: int32 BE],
  stored in a file whose byte 0 is format-version 1, or Z85-inlined in the
  `deletionVector` descriptor of an `add` action.

No third-party roaring/zmq lib ships in this container, so the codec is
implemented from the specs directly. It is driver-side, metadata-sized
work: a DV is bounded by its file's row count and serializes to KBs–MBs —
the same material every DV-aware reader's planning phase parses. The DATA
path never touches this module (deleted positions are anti-joined in the
JVM; see lakehouse._scan_files).
"""

from __future__ import annotations

import struct
import zlib

# ------------------------------------------------------------------- Z85 ----

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes -> 5 chars, big-endian base-85. Input length
    must be a multiple of 4 (the spec has no padding)."""
    if len(data) % 4:
        raise ValueError(f"z85: length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, rem = divmod(v, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85: length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"z85: invalid character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85: chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------- 32-bit roaring (portable) ----

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _serialize_roaring32(values: "list[int]") -> bytes:
    """Serialize SORTED, DISTINCT uint32 values per RoaringFormatSpec.
    Emits array containers (card <= 4096) and bitmap containers only —
    always valid; run containers are a size optimization the reader
    handles but the writer does not need."""
    containers: list[tuple[int, list[int]]] = []
    cur_key: int | None = None
    cur: list[int] = []
    for v in values:
        key, low = v >> 16, v & 0xFFFF
        if key != cur_key:
            if cur_key is not None:
                containers.append((cur_key, cur))
            cur_key, cur = key, []
        cur.append(low)
    if cur_key is not None:
        containers.append((cur_key, cur))

    n = len(containers)
    # no-run cookie: 4-byte cookie, 4-byte container count, headers,
    # ALWAYS an offset header (spec: required with this cookie)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", key, len(lows) - 1) for key, lows in containers
    )
    bodies: list[bytes] = []
    for _key, lows in containers:
        if len(lows) <= _ARRAY_MAX:
            bodies.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            words = [0] * 1024
            for low in lows:
                words[low >> 6] |= 1 << (low & 63)
            bodies.append(struct.pack("<1024Q", *words))
    offsets = []
    pos = len(head) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    off = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + off + b"".join(bodies)


# --------------------------------------- 64-bit RoaringBitmapArray ----

_DV_MAGIC = 1681511377


def serialize_positions(positions: "list[int]") -> bytes:
    """Positions (sorted, distinct, >= 0) -> Delta DV data bytes:
    [magic int32 LE][8-byte LE bitmap count][portable 32-bit bitmaps],
    bitmap i holding positions with high word i (empty bitmaps included —
    the array is dense by high word, per RoaringBitmapArray)."""
    if any(p < 0 for p in positions):
        raise ValueError("deletion vector positions must be >= 0")
    positions = sorted(set(positions))
    n_bitmaps = (positions[-1] >> 32) + 1 if positions else 0
    by_high: list[list[int]] = [[] for _ in range(n_bitmaps)]
    for p in positions:
        by_high[p >> 32].append(p & 0xFFFFFFFF)
    parts = [struct.pack("<I", _DV_MAGIC), struct.pack("<Q", n_bitmaps)]
    parts.extend(_serialize_roaring32(lows) for lows in by_high)
    return b"".join(parts)


def deserialize_positions(data: bytes) -> "list[int]":
    """Inverse of serialize_positions; validates the magic."""
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(f"deletion vector: bad magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<Q", data, 4)
    pos = 12
    out: list[int] = []
    for i in range(n_bitmaps):
        vals, pos = _parse32(data, pos, i << 32)
        out.extend(vals)
    return out


def _parse32(buf: bytes, start: int, base: int) -> "tuple[list[int], int]":
    """Sequential portable-32-bit parse at absolute offset ``start``,
    values offset by ``base``."""
    (cookie16,) = struct.unpack_from("<H", buf, start)
    pos = start
    if cookie16 == _SERIAL_COOKIE:
        (packed,) = struct.unpack_from("<I", buf, pos)
        n = (packed >> 16) + 1
        pos += 4
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie16 == _SERIAL_COOKIE_NO_RUN:
        _, n = struct.unpack_from("<II", buf, pos)
        pos += 8
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"roaring: bad cookie {cookie16}")
    keys_cards = [struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n
    out: list[int] = []
    for i, (key, card_m1) in enumerate(keys_cards):
        card = card_m1 + 1
        hi = key << 16
        is_run = bool(run_flags and (run_flags[i // 8] & (1 << (i % 8))))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                s, l_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(base + hi + s + j for j in range(l_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(base + hi + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(base + hi + (w_i << 6) + b.bit_length() - 1)
                    w ^= b
    return out, pos


# ------------------------------------------------------- DV blob framing ----


def frame_dv_blob(data: bytes) -> bytes:
    """One on-file DV blob: [dataSize int32 BE][data][CRC-32(data) int32
    BE]. ``data`` already starts with the magic."""
    return struct.pack(">i", len(data)) + data + struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )


def read_dv_blob(buf: bytes, offset: int, size_in_bytes: "int | None") -> bytes:
    """Extract + checksum-verify the DV data at ``offset`` (which points at
    the dataSize field, per the descriptor spec). ``size_in_bytes=None``
    trusts the stored dataSize (Iceberg v3 puffin blobs, where the blob
    length is already footer-framed)."""
    (size,) = struct.unpack_from(">i", buf, offset)
    if size_in_bytes is not None and size != size_in_bytes:
        raise ValueError(
            f"deletion vector: descriptor sizeInBytes={size_in_bytes} but "
            f"stored dataSize={size}"
        )
    data = buf[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", buf, offset + 4 + size)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("deletion vector: CRC-32 mismatch (corrupt blob)")
    return data
