"""Unit tests for the deletion-vector codec — the public Delta wire
format (z85, 64-bit portable RoaringBitmapArray, .bin framing), tested
layer by layer so a read-path bug can be localized to encode, frame, or
descriptor resolution.

Reference behavior: the reference repo has no deletion-vector support
(it is a Polars/dbt/Airflow pipeline); this codec follows the public
Delta protocol spec (delta-io PROTOCOL.md, "Deletion Vectors") and the
RoaringFormatSpec portable format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from portfolio_data_pipelines_spark.operators.deletion_vectors import (
    MAGIC,
    decode_dv_data,
    descriptor_data,
    descriptor_positions,
    deserialize_roaring64,
    dv_rel_path,
    frame_dv_blob,
    inline_descriptor,
    new_dv_file_name,
    serialize_roaring64,
    unframe_dv,
    z85_decode,
    z85_encode,
)


# ---------------------------------------------------------------- z85


def test_z85_spec_vector():
    # the ZeroMQ spec 32 reference vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


def test_z85_padding_roundtrip():
    for n in range(0, 17):
        data = bytes(range(n))
        assert z85_decode(z85_encode(data), n) == data


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid z85"):
        z85_decode("abc d")


# ---------------------------------------------------- roaring64 codec


@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [0, 1, 2, 3],
        [5, 70000, 70001, 1 << 20],  # spans two 16-bit containers
        list(range(0, 5000)),  # > _ARRAY_MAX: bitmap container
        [3, (1 << 32) + 7, (1 << 40) + 1],  # spans 32-bit keys
        [(1 << 63) - 1],  # top of the 63-bit domain
    ],
    ids=["empty", "one", "small", "two_containers", "bitmap", "hi_keys", "max"],
)
def test_roaring64_roundtrip(positions):
    out = deserialize_roaring64(serialize_roaring64(positions))
    assert out.tolist() == sorted(set(positions))


def test_roaring64_duplicates_collapse():
    out = deserialize_roaring64(serialize_roaring64([7, 7, 7, 9]))
    assert out.tolist() == [7, 9]


def test_roaring64_rejects_out_of_domain():
    with pytest.raises(ValueError, match="63-bit"):
        serialize_roaring64([1 << 63])


def test_roaring64_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        deserialize_roaring64(struct.pack("<iq", 123, 0))


def test_roaring32_run_container_form_is_read():
    """Foreign engines may serialize with RUN containers (cookie
    12347); hand-build one 32-bit bitmap holding runs [2..5] and
    [100..100] and check the reader expands it."""
    runs = [(2, 3), (100, 0)]  # (start, length-1)
    n = 1  # one container, key 0
    cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flag = bytes([0b1])  # container 0 is a run container
    card = sum(ln + 1 for _s, ln in runs)
    desc = struct.pack("<HH", 0, card - 1)
    payload = struct.pack("<H", len(runs)) + b"".join(
        struct.pack("<HH", s, ln) for s, ln in runs
    )
    # n < 4 run-form: no offset header
    bitmap32 = cookie + run_flag + desc + payload
    data = struct.pack("<iq", MAGIC, 1) + struct.pack("<I", 0) + bitmap32
    assert deserialize_roaring64(data).tolist() == [2, 3, 4, 5, 100]


# ------------------------------------------------------- .bin framing


def test_frame_unframe_roundtrip_multiple_dvs():
    d1 = serialize_roaring64([1, 5])
    d2 = serialize_roaring64(range(100, 8000))
    blob, metas = frame_dv_blob([d1, d2])
    assert blob[0] == 1
    for data, (off, size) in zip([d1, d2], metas):
        assert unframe_dv(blob, off, size) == data


def test_unframe_rejects_corruption():
    data = serialize_roaring64([4])
    blob, [(off, size)] = frame_dv_blob([data])
    with pytest.raises(ValueError, match="size mismatch"):
        unframe_dv(blob, off, size + 1)
    flipped = bytearray(blob)
    flipped[off + 4 + 2] ^= 0xFF  # corrupt a data byte
    with pytest.raises(ValueError, match="checksum"):
        unframe_dv(bytes(flipped), off, size)
    with pytest.raises(ValueError, match="format version"):
        unframe_dv(b"\x02" + blob[1:], off, size)


# ------------------------------------------------ descriptor plumbing


def test_inline_descriptor_roundtrip():
    desc = inline_descriptor([0, 3, 3, 9])
    assert desc["storageType"] == "i"
    assert desc["cardinality"] == 3
    pos = descriptor_positions(desc, read_rel=None)
    assert pos.tolist() == [0, 3, 9]


def test_uuid_path_descriptor_roundtrip():
    positions = [2, 4, 1 << 33]
    data = serialize_roaring64(positions)
    blob, [(off, size)] = frame_dv_blob([data])
    path_or_inline, rel = new_dv_file_name()
    assert dv_rel_path(path_or_inline) == rel
    store = {rel: blob}
    desc = {
        "storageType": "u",
        "pathOrInlineDv": path_or_inline,
        "offset": off,
        "sizeInBytes": size,
        "cardinality": 3,
    }
    reads = []

    def read_rel(loc):
        reads.append(loc)
        return store[loc]

    cache = {}
    pos = descriptor_positions(desc, read_rel, cache)
    assert pos.tolist() == sorted(positions)
    # second descriptor into the same blob: cache prevents a re-read
    descriptor_positions(desc, read_rel, cache)
    assert len(reads) == 1


def test_absolute_path_descriptor():
    data = serialize_roaring64([11])
    blob, [(off, size)] = frame_dv_blob([data])
    desc = {
        "storageType": "p",
        "pathOrInlineDv": "/abs/some.bin",
        "offset": off,
        "sizeInBytes": size,
        "cardinality": 1,
    }
    pos = descriptor_positions(desc, read_rel=lambda loc: blob)
    assert pos.tolist() == [11]


def test_cardinality_mismatch_refused():
    desc = inline_descriptor([1, 2, 3])
    desc["cardinality"] = 2
    with pytest.raises(ValueError, match="cardinality mismatch"):
        descriptor_positions(desc, read_rel=None)


def test_unknown_storage_type_refused():
    with pytest.raises(ValueError, match="storageType"):
        descriptor_data({"storageType": "x"}, read_rel=None)


def test_descriptor_data_stays_compressed():
    """The shippable form is the BITMAP, not the positions: a dense
    million-row DV's data must be orders of magnitude smaller than its
    8 B/position explosion (this is what makes executor-side decode the
    scale path)."""
    desc = inline_descriptor(range(1_000_000))
    data = descriptor_data(desc, read_rel=None)
    assert len(data) < 200_000  # bitmap containers: ~8 KiB per 65536 rows
    assert len(decode_dv_data(data, 1_000_000)) == 1_000_000
