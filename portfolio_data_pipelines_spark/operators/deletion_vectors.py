"""Deletion-vector codec — the public Delta protocol's DV wire format.

Deletion vectors (Delta protocol, "Deletion Vectors" + reader version 3
/ ``deletionVectors`` table feature) mark rows of a parquet data file as
logically deleted WITHOUT rewriting the file: an ``add`` action carries
a ``deletionVector`` descriptor naming a serialized 64-bit Roaring
bitmap of deleted row indexes. This module implements the three public
layers, dependency-free:

1. **Z85** (ZeroMQ base85) — the encoding the protocol uses for inline
   DV data and for the UUID embedded in relative DV paths. Inputs whose
   length is not a multiple of 4 are zero-padded on encode and truncated
   to the caller's expected length on decode, matching delta-spark's
   ``Base85Codec``.
2. **64-bit RoaringBitmapArray, "portable" serialization** — magic
   number ``1681511377`` (4 bytes little-endian), then an 8-byte
   little-endian count of 32-bit bitmaps, then per bitmap a 4-byte
   little-endian key (the value's high 32 bits) followed by a standard
   32-bit RoaringBitmap in the public RoaringFormatSpec portable
   format. The writer emits the no-run-container form (cookie 12346:
   array containers to cardinality 4096, bitmap containers above); the
   reader additionally accepts the run-container form (cookie 12347)
   that other engines may produce.
3. **DV file framing** — a ``.bin`` file holding a 1-byte format
   version (1) then one or more DVs, each framed as a 4-byte BIG-endian
   data size, the bitmap data, and a 4-byte big-endian CRC-32 of the
   data; the descriptor's ``offset`` points at the size field and
   ``sizeInBytes`` is the data length (delta-spark's
   ``DeletionVectorStore`` layout).

Descriptor ``storageType``: ``u`` (relative file — ``pathOrInlineDv``
is ``<random prefix><z85 uuid>``, resolved to
``<prefix>/deletion_vector_<uuid>.bin`` under the table root), ``i``
(inline — ``pathOrInlineDv`` is the z85 of the bitmap data), ``p``
(absolute path). All three are read; the writer emits ``u`` by default
and ``i`` below an inline threshold.

Scale note: a DV is O(deleted rows in ONE file) by construction —
engines cap per-file DV growth by rewriting heavily-deleted files
(OPTIMIZE does this here too, since compaction reads through the DV
filter and writes clean files). Decode is numpy-vectorized; a typical
DV (thousands of positions) decodes in microseconds.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

import numpy as np

#: RoaringBitmapArray portable-format magic (little-endian on the wire).
MAGIC = 1681511377

#: RoaringFormatSpec cookies.
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
#: Containers with cardinality above this serialize as 8 KiB bitsets.
_ARRAY_MAX = 4096

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (zero-padded to a multiple of 4 bytes; 4
    bytes → 5 chars, big-endian group value, most significant digit
    first)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for (v,) in struct.iter_unpack(">I", data):
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str, length: int | None = None) -> bytes:
    """Decode a Z85 string; ``length`` truncates the zero-padded tail
    back to the original byte count."""
    if len(s) % 5:
        raise ValueError(f"z85 length {len(s)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out[:length]) if length is not None else bytes(out)


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """One 32-bit RoaringBitmap, portable no-run-container form:
    cookie, container count, descriptive header (key, cardinality-1),
    offset header, then container payloads in key order."""
    keys16 = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq, starts = np.unique(keys16, return_index=True)
    bounds = list(starts) + [len(values)]
    header = struct.pack("<II", _COOKIE_NO_RUN, len(uniq))
    desc = b"".join(
        struct.pack("<HH", int(k), (bounds[i + 1] - bounds[i]) - 1)
        for i, k in enumerate(uniq)
    )
    payloads = []
    for i in range(len(uniq)):
        vals = lows[bounds[i] : bounds[i + 1]]
        if len(vals) <= _ARRAY_MAX:
            payloads.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[vals] = True
            payloads.append(np.packbits(bits, bitorder="little").tobytes())
    base = len(header) + len(desc) + 4 * len(uniq)
    offs, pos = [], base
    for p in payloads:
        offs.append(pos)
        pos += len(p)
    offsets = struct.pack(f"<{len(offs)}I", *offs)
    return header + desc + offsets + b"".join(payloads)


def serialize_roaring64(positions) -> bytes:
    """Serialized RoaringBitmapArray (portable, with magic) of the
    given row positions. Positions must be non-negative; duplicates
    collapse."""
    vals = np.unique(np.asarray(list(positions), dtype=np.uint64))
    if len(vals) and int(vals[-1]) >> 63:
        raise ValueError("row index exceeds the 63-bit DV domain")
    keys = (vals >> np.uint64(32)).astype(np.uint32)
    lows = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(vals)]
    out = [struct.pack("<iq", MAGIC, len(uniq))]
    for i, k in enumerate(uniq):
        out.append(struct.pack("<I", int(k)))
        out.append(_serialize_roaring32(lows[bounds[i] : bounds[i + 1]]))
    return b"".join(out)


def _parse_roaring32(buf: bytes, pos: int):
    """Parse one 32-bit RoaringBitmap at ``pos``; returns
    (uint32 ndarray of values, position after the bitmap). Accepts
    array, bitmap and run containers under both cookies."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_flags = None
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, nbytes, pos), bitorder="little"
        )[:n]
        pos += nbytes
        has_offsets = n >= 4
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"not a RoaringBitmap (cookie {cookie})")
    keys = np.empty(n, np.uint32)
    cards = np.empty(n, np.int64)
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, c + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # payloads follow in key order; offsets redundant
    parts = []
    for i in range(n):
        hi = keys[i].astype(np.uint32) << np.uint32(16)
        if run_flags is not None and run_flags[i]:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, "<u2", 2 * nruns, pos).reshape(-1, 2)
            pos += 4 * nruns
            vals = np.concatenate(
                [
                    np.arange(s, s + ln + 1, dtype=np.uint32)
                    for s, ln in runs.astype(np.uint32)
                ]
            ) if nruns else np.empty(0, np.uint32)
        elif cards[i] > _ARRAY_MAX:
            words = np.frombuffer(buf, np.uint8, 8192, pos)
            pos += 8192
            vals = np.nonzero(
                np.unpackbits(words, bitorder="little")
            )[0].astype(np.uint32)
        else:
            vals = np.frombuffer(buf, "<u2", int(cards[i]), pos).astype(
                np.uint32
            )
            pos += 2 * int(cards[i])
        parts.append(hi | vals)
    values = np.concatenate(parts) if parts else np.empty(0, np.uint32)
    return values, pos


def deserialize_roaring64(data: bytes) -> np.ndarray:
    """Bitmap data (magic + portable RoaringBitmapArray) → sorted int64
    ndarray of row positions."""
    magic, nmaps = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad DV magic {magic} (expected {MAGIC})")
    pos, parts = 12, []
    for _ in range(nmaps):
        (key,) = struct.unpack_from("<I", data, pos)
        vals, pos = _parse_roaring32(data, pos + 4)
        parts.append((np.uint64(key) << np.uint64(32)) | vals.astype(np.uint64))
    out = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    return np.sort(out).astype(np.int64)


def frame_dv_blob(bitmaps: list[bytes]):
    """The on-disk .bin layout for a list of bitmap datas: version byte
    1, then per DV ``<size:4BE><data><crc32:4BE>``. Returns (blob,
    [(offset, sizeInBytes), ...]) with offsets pointing at each size
    field, as descriptors require."""
    blob = bytearray(b"\x01")
    metas = []
    for data in bitmaps:
        metas.append((len(blob), len(data)))
        blob += struct.pack(">I", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(blob), metas


def unframe_dv(blob: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract + verify one DV's bitmap data from a .bin blob."""
    if not blob or blob[0] != 1:
        raise ValueError(
            f"unsupported DV file format version {blob[0] if blob else '?'}"
        )
    (stored,) = struct.unpack_from(">I", blob, offset)
    if stored != size_in_bytes:
        raise ValueError(
            f"DV size mismatch: descriptor says {size_in_bytes}, "
            f"file says {stored}"
        )
    data = blob[offset + 4 : offset + 4 + stored]
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + stored)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("DV checksum mismatch")
    return data


def new_dv_file_name() -> tuple[str, str]:
    """A fresh DV file identity: (pathOrInlineDv for storageType 'u',
    relative file path under the table root). The path embeds the
    UUID z85-encoded per the protocol; the prefix is empty (valid —
    prefixes exist only to shard object-store keys)."""
    u = _uuid.uuid4()
    return z85_encode(u.bytes), f"deletion_vector_{u}.bin"


def dv_rel_path(path_or_inline: str) -> str:
    """storageType 'u' → the relative .bin path: the LAST 20 chars are
    the z85 UUID, anything before is a directory prefix."""
    if len(path_or_inline) < 20:
        raise ValueError(f"malformed DV path {path_or_inline!r}")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc, 16))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix.rstrip('/')}/{name}" if prefix else name


def inline_descriptor(positions) -> dict:
    """An ``i``-storage descriptor carrying the bitmap inline."""
    data = serialize_roaring64(positions)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": int(len(np.unique(np.asarray(list(positions))))),
    }


def descriptor_data(desc: dict, read_rel, table_blob_cache=None) -> bytes:
    """Resolve a descriptor to its RAW bitmap data (magic + portable
    RoaringBitmapArray) without decoding — the bytes stay small
    (compressed bitmap, never the exploded positions), so callers can
    ship them to executors and decode there. ``read_rel`` maps a
    relative ('u') or absolute ('p') path to the file's bytes;
    ``table_blob_cache`` (dict) avoids re-reading a .bin shared by many
    descriptors of one commit."""
    st = desc["storageType"]
    if st == "i":
        return z85_decode(desc["pathOrInlineDv"], int(desc["sizeInBytes"]))
    if st in ("u", "p"):
        loc = (
            dv_rel_path(desc["pathOrInlineDv"])
            if st == "u"
            else desc["pathOrInlineDv"]
        )
        if table_blob_cache is not None and loc in table_blob_cache:
            blob = table_blob_cache[loc]
        else:
            blob = read_rel(loc)
            if table_blob_cache is not None:
                table_blob_cache[loc] = blob
        return unframe_dv(blob, int(desc["offset"]), int(desc["sizeInBytes"]))
    raise ValueError(f"unknown DV storageType {st!r}")


def decode_dv_data(data: bytes, cardinality: int) -> np.ndarray:
    """Bitmap data → sorted positions, verified against the
    descriptor's declared cardinality (a corrupt or mismatched bitmap
    must fail loudly, never silently delete the wrong rows)."""
    out = deserialize_roaring64(data)
    if len(out) != int(cardinality):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says "
            f"{cardinality}, bitmap holds {len(out)}"
        )
    return out


def descriptor_positions(desc: dict, read_rel, table_blob_cache=None) -> np.ndarray:
    """Resolve a descriptor to its sorted row positions (driver-side
    convenience: :func:`descriptor_data` + :func:`decode_dv_data`)."""
    return decode_dv_data(
        descriptor_data(desc, read_rel, table_blob_cache),
        int(desc["cardinality"]),
    )
