"""Reference DiskTree binary format: reader + writer interchange.

Byte-compatible with the reference's on-disk tree so a user can hand a
reference-produced ``.disktree`` file to this engine (or produce one it
can read back):

* header: magic ``b"hextree\\0"`` + one version byte stored as
  ``0xFE - version`` (/root/reference/src/disktree/tree.rs:16-17,56-60)
* 122 base-cell pointers, 5-byte little-endian u64 each, 0 = absent
  (/root/reference/src/disktree/dptr.rs:14-41,
   /root/reference/src/disktree/writer.rs:55-64)
* node: first byte MSB=1 → Parent (tag bit d = child digit d present,
  bit 7 = sentinel; then one 5-byte dptr per present child in digit
  order), MSB=0 → Leaf (prefix-code varint value length — which never
  sets the top bit — then the value bytes)
  (/root/reference/src/disktree/writer.rs:76-121,
   /root/reference/src/disktree/varint.rs:13-35)
* write order parity: children are written depth-first *after* their
  parent record, each child's subtree completed before the next
  sibling, with dptr backpatching — same bytes the reference emits
  (/root/reference/src/disktree/writer.rs:66-70,118-123).

The tree structure encodes cells implicitly as (base, digit-path);
values are user-serialized bytes, exactly like the reference's
``to_disktree(wtr, f)`` closure.  Region tables are broadcast-scale by
construction (SURVEY §1.4), so codec runs driver-side; the decoded
table is a normal DataFrame for distributed joins.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterable, Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from . import cells_np as cnp
from . import constants as K

HDR_MAGIC = b"hextree\x00"
NUM_BASE = 122
DPTR_SZ = 5
VERSION = 0


# ---------------------------------------------------------------------------
# varint (prefix code, big-endian payload — disktree/varint.rs)
# ---------------------------------------------------------------------------

def varint_write(value: int) -> bytes:
    if value < 0x40:
        return bytes([value | 0x40])
    if value < 0x2000:
        return struct.pack(">H", value | 0x2000)
    if value < 0x10_0000:
        v = value | 0x10_0000
        return bytes([v >> 16]) + struct.pack(">H", v & 0xFFFF)
    if value < 0x800_0000:
        return struct.pack(">I", value | 0x800_0000)
    raise ValueError(f"varint overflow: {value}")


def varint_read(buf: bytes, pos: int) -> tuple[int, int]:
    a = buf[pos]
    if a & 0x80:
        raise ValueError("not a varint (parent tag byte)")
    if a & 0x40:
        return a & 0x3F, 1
    if a & 0x20:
        return ((a & 0x1F) << 8) | buf[pos + 1], 2
    if a & 0x10:
        return ((a & 0x0F) << 16) | (buf[pos + 1] << 8) | buf[pos + 2], 3
    if a & 0x08:
        return (
            ((a & 0x07) << 24)
            | (buf[pos + 1] << 16)
            | (buf[pos + 2] << 8)
            | buf[pos + 3]
        ), 4
    raise ValueError("invalid varint prefix")


def _dptr_read(buf: bytes, pos: int) -> int:
    return int.from_bytes(buf[pos : pos + DPTR_SZ], "little")


def _dptr_bytes(v: int) -> bytes:
    # the reference's Dp::from asserts raw <= 2^40-1 (disktree/dptr.rs);
    # silently truncating would corrupt any >1 TiB file
    if v >= 1 << (8 * DPTR_SZ):
        raise ValueError(f"disk pointer {v} exceeds 5-byte range (file > 1 TiB)")
    return v.to_bytes(8, "little")[:DPTR_SZ]


# ---------------------------------------------------------------------------
# value serializers (the reference leaves this to the caller's closure)
# ---------------------------------------------------------------------------

def ser_i64(v) -> bytes:
    return struct.pack("<q", int(v))


def de_i64(b: bytes):
    return struct.unpack("<q", b)[0]


def ser_unit(_v) -> bytes:  # HexTreeSet: zero-length values
    return b""


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _digits_of(cell: int) -> tuple[int, list[int]]:
    c = np.array([cell], dtype=np.int64)
    res = int(cnp.res(c)[0])
    base = int(cnp.base_cell(c)[0])
    digs = [int((cell >> ((K.MAX_RES - i) * K.DIGIT_BITS)) & 0x7) for i in range(1, res + 1)]
    return base, digs


def _build_tree(pairs: Iterable[tuple[int, object]]):
    """Nested children-array tree from compacted (cell, value) pairs."""
    roots: list = [None] * NUM_BASE
    for cell, value in pairs:
        base, digs = _digits_of(int(cell))
        if not digs:
            roots[base] = ("leaf", value)
            continue
        if roots[base] is None:
            roots[base] = ("parent", [None] * 7)
        node = roots[base]
        for d in digs[:-1]:
            kids = node[1]
            if kids[d] is None:
                kids[d] = ("parent", [None] * 7)
            node = kids[d]
        node[1][digs[-1]] = ("leaf", value)
    return roots


def write_disktree(
    pairs: Iterable[tuple[int, object]],
    path: str,
    value_ser: Callable[[object], bytes] = ser_i64,
) -> None:
    """Serialize compacted (cell, value) pairs to a reference-format
    disktree file.  Cells must be pairwise non-related (a compacted
    table — the output of :func:`hexspark.build.build_region`)."""
    roots = _build_tree(pairs)
    buf = bytearray()
    buf += HDR_MAGIC
    buf.append(0xFE - VERSION)
    base_pos = len(buf)
    buf += b"\x00" * (DPTR_SZ * NUM_BASE)

    def write_node(node) -> int:
        pos = len(buf)
        kind, payload = node
        if kind == "leaf":
            vb = value_ser(payload)
            buf.extend(varint_write(len(vb)))
            buf.extend(vb)
            return pos
        # parent: tag byte then dptr slots for present children
        tag = 0
        for d in range(7):
            tag >>= 1
            if payload[d] is not None:
                tag |= 0b1000_0000
        tag = (tag >> 1) | 0b1000_0000  # sentinel bit
        buf.append(tag)
        slots = []
        for d in range(7):
            if payload[d] is not None:
                slots.append((len(buf), d))
                buf.extend(b"\x00" * DPTR_SZ)
        # children written after the parent record, subtree-complete
        # before the next sibling (writer.rs write order)
        for slot_pos, d in slots:
            child_dp = write_node(payload[d])
            buf[slot_pos : slot_pos + DPTR_SZ] = _dptr_bytes(child_dp)
        return pos

    for b in range(NUM_BASE):
        if roots[b] is not None:
            dp = write_node(roots[b])
            p = base_pos + DPTR_SZ * b
            buf[p : p + DPTR_SZ] = _dptr_bytes(dp)
    with open(path, "wb") as f:
        f.write(bytes(buf))


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _check_header(buf: bytes) -> None:
    if buf[: len(HDR_MAGIC)] != HDR_MAGIC:
        raise ValueError("not a disktree file (bad magic)")
    version = 0xFE - buf[len(HDR_MAGIC)]
    if version != VERSION:
        raise ValueError(f"unsupported disktree version {version}")


def _cell_from_path(base: int, digs: list[int]) -> int:
    res = len(digs)
    digits = K.trailing_mask(res)
    for i, d in enumerate(digs, start=1):
        digits += d << ((K.MAX_RES - i) * K.DIGIT_BITS)
    return (
        (K.MODE_CELL << K.MODE_OFFSET)
        | (base << K.BASE_OFFSET)
        | (res << K.RES_OFFSET)
        | digits
    )


def iter_disktree(
    path: str, value_de: Optional[Callable[[bytes], object]] = de_i64
):
    """Yield (cell, value) in the file's DFS order — which equals the
    reference's iteration order (== ascending ``lo``)."""
    with open(path, "rb") as f:
        buf = f.read()
    _check_header(buf)
    hdr = len(HDR_MAGIC) + 1

    def walk(pos: int, base: int, digs: list[int]):
        first = buf[pos]
        if first & 0x80:  # parent
            present = [d for d in range(7) if (first >> d) & 1]
            p = pos + 1
            for d in present:
                dp = _dptr_read(buf, p)
                p += DPTR_SZ
                yield from walk(dp, base, digs + [d])
        else:
            vlen, n = varint_read(buf, pos)
            vb = buf[pos + n : pos + n + vlen]
            yield _cell_from_path(base, digs), (
                value_de(vb) if value_de else bytes(vb)
            )

    for b in range(NUM_BASE):
        dp = _dptr_read(buf, hdr + DPTR_SZ * b)
        if dp != 0:
            yield from walk(dp, b, [])


def disktree_get(
    buf: bytes, cell: int, value_de: Optional[Callable[[bytes], object]] = de_i64
):
    """Random-access nearest-ancestor lookup against the raw file bytes
    — the reference's ``DiskTreeMap::get`` descent
    (/root/reference/src/disktree/tree.rs:66-114): returns
    (stored_cell, value) or None; a probe coarser than the stored
    leaves under it misses (node.rs:93-96)."""
    _check_header(buf)
    base, digs = _digits_of(int(cell))
    pos = _dptr_read(buf, len(HDR_MAGIC) + 1 + DPTR_SZ * base)
    if pos == 0:
        return None
    taken: list[int] = []
    while True:
        first = buf[pos]
        if not first & 0x80:  # leaf at-or-above the probe: ancestor hit
            vlen, n = varint_read(buf, pos)
            vb = buf[pos + n : pos + n + vlen]
            return _cell_from_path(base, taken), (
                value_de(vb) if value_de else bytes(vb)
            )
        if len(taken) == len(digs):
            return None  # coarse probe over a Parent: miss
        d = digs[len(taken)]
        if not (first >> d) & 1:
            return None  # no child on the probe's digit path
        skip = bin(first & ((1 << d) - 1)).count("1")
        pos = _dptr_read(buf, pos + 1 + DPTR_SZ * skip)
        taken.append(d)


def read_disktree(
    spark: SparkSession,
    path: str,
    value_de: Optional[Callable[[bytes], object]] = de_i64,
    value_type: str = "long",
) -> DataFrame:
    """Parse a disktree file into a (cell, value) DataFrame for
    distributed joins (S3/J3 source)."""
    rows = [(c, v) for c, v in iter_disktree(path, value_de)]
    return spark.createDataFrame(rows, f"cell: long, value: {value_type}")
