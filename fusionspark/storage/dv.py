"""Delta Lake deletion-vector codec — Z85 + RoaringBitmapArray, stdlib only.

Implements the deletion-vector storage format from the public Delta
protocol (https://github.com/delta-io/delta/blob/master/PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format"), which storage/delta.py
uses to read minReaderVersion-3 tables with the `deletionVectors`
reader feature:

- a DV descriptor on an `add` action names where the bitmap lives:
  storageType 'u' (relative file, path derived from a Z85-encoded
  UUID), 'p' (absolute path), or 'i' (inline, Z85 of the bitmap bytes);
- the on-disk DV file is: 1 version byte, then per stored vector at
  its descriptor offset: [dataSize: int32 BIG-endian][bitmap data]
  [CRC-32 of the data: int32 BIG-endian];
- the bitmap data is Delta's RoaringBitmapArray "native format":
  magic 1681511377 (int32 little-endian), then int64 LE count of
  32-bit roaring bitmaps, then each 32-bit bitmap in the standard
  roaring "portable" serialization (little-endian; array / bitmap /
  run containers — https://github.com/RoaringBitmap/RoaringFormatSpec).
  Bitmap i holds the low 32 bits of row indexes with high 32 bits = i.

The deserializer handles all three container kinds (real writers emit
run containers after OPTIMIZE); the serializer (test-fixture writer)
emits the no-run layout, which every real reader accepts.

Scale: DVs are metadata-sized (a bitmap over one file's rows);
decoding happens once per snapshot resolve and the deleted (file,
row_index) pairs join the scan as an ordinary anti-join key set.
"""

from __future__ import annotations

import os
import struct
import zlib

_MAGIC = 1681511377

# Z85 alphabet (ZeroMQ spec 32/Z85 — the Base85 variant Delta uses)
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("Z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("Z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INV[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("Z85 chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap (portable format), little-endian throughout
# ---------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit roaring bitmap at buf[pos:] → (sorted values, new pos)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        pos += 4
        run_flag_len = (n_containers + 7) // 8
        run_flags = buf[pos : pos + run_flag_len]
        pos += run_flag_len
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n_containers):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for a linear scan
    values: list[int] = []
    for i in range(n_containers):
        base = keys[i] << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return values, pos


def _serialize_rb32(values: list[int]) -> bytes:
    """Sorted 32-bit values → portable bytes (no-run layout)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (mandatory in the no-run layout)
    off = len(out) + 4 * len(keys)
    offsets = []
    for k in keys:
        offsets.append(off)
        off += (
            2 * len(containers[k]) if len(containers[k]) <= 4096 else 8192
        )
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
    return bytes(out)


def roaring_array_serialize(indexes: list[int]) -> bytes:
    """Sorted 64-bit row indexes → Delta native-format bitmap data."""
    highs: dict[int, list[int]] = {}
    for v in sorted(indexes):
        if v < 0:
            raise ValueError("row index must be non-negative")
        highs.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(highs) + 1) if highs else 0
    out = bytearray(struct.pack("<iq", _MAGIC, n))
    for h in range(n):
        out += _serialize_rb32(highs.get(h, []))
    return bytes(out)


def roaring_array_deserialize(data: bytes) -> list[int]:
    """Delta native-format bitmap data → sorted 64-bit row indexes."""
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    pos = 12
    out: list[int] = []
    for h in range(n):
        if pos >= len(data):
            break  # trailing empty bitmaps may be elided
        vals, pos = _deserialize_rb32(data, pos)
        out.extend((h << 32) + v for v in vals)
    return out


# ---------------------------------------------------------------------------
# descriptor resolution + file IO
# ---------------------------------------------------------------------------


def dv_file_path(table_path: str, path_or_inline: str) -> str:
    """storageType 'u': the last 20 chars are the Z85 UUID, anything
    before is an optional random prefix directory."""
    encoded = path_or_inline[-20:]
    prefix = path_or_inline[:-20]
    u = z85_decode(encoded)
    import uuid as _uuid

    name = f"deletion_vector_{_uuid.UUID(bytes=u)}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def read_dv(table_path: str, desc: dict) -> list[int]:
    """Resolve a DV descriptor to its sorted deleted row indexes."""
    st = desc["storageType"]
    if st == "i":
        # Z85 works in 4-byte blocks; sizeInBytes carries the true length
        data = z85_decode(desc["pathOrInlineDv"])[: int(desc["sizeInBytes"])]
        idx = roaring_array_deserialize(data)
        card = int(desc.get("cardinality", len(idx)))
        if card != len(idx):
            # a truncated/corrupt inline payload must fail loudly, not
            # silently resurrect deleted rows
            raise ValueError(
                f"deletion-vector cardinality mismatch: descriptor {card}, "
                f"bitmap {len(idx)}"
            )
        return idx
    if st == "u":
        path = dv_file_path(table_path, desc["pathOrInlineDv"])
    elif st == "p":
        path = desc["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown deletion-vector storageType {st!r}")
    offset = int(desc.get("offset") or 0)
    size = int(desc["sizeInBytes"])
    with open(path, "rb") as f:
        f.seek(offset)
        (stored_size,) = struct.unpack(">i", f.read(4))
        if stored_size != size:
            raise ValueError(
                f"deletion-vector size mismatch: descriptor {size}, "
                f"file {stored_size}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector checksum mismatch")
    idx = roaring_array_deserialize(data)
    card = int(desc.get("cardinality", len(idx)))
    if card != len(idx):
        raise ValueError(
            f"deletion-vector cardinality mismatch: descriptor {card}, "
            f"bitmap {len(idx)}"
        )
    return idx


def write_dv_file(table_path: str, indexes: list[int]) -> dict:
    """Fixture writer: persist `indexes` as an on-disk DV in the real
    format and return the descriptor for an `add` action."""
    import uuid as _uuid

    u = _uuid.uuid4()
    data = roaring_array_serialize(indexes)
    name = f"deletion_vector_{u}.bin"
    with open(os.path.join(table_path, name), "wb") as f:
        f.write(b"\x01")  # format version
        offset = f.tell()
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(indexes),
    }


def inline_dv_descriptor(indexes: list[int]) -> dict:
    """Fixture helper: an inline ('i') descriptor for `indexes`."""
    data = roaring_array_serialize(indexes)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * (-len(data) % 4)),
        "sizeInBytes": len(data),
        "cardinality": len(indexes),
    }
