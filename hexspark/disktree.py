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

class _FileBuf:
    """Bytes-like view over an open file: integer and slice indexing
    via seek+read — the lazy-paging analogue of the reference's
    ``DiskTreeMap`` which never loads the file wholly
    (/root/reference/src/disktree/tree.rs:33-37).  Tracks
    ``bytes_read`` so tests can assert sub-linear access."""

    def __init__(self, f):
        self._f = f
        self.bytes_read = 0

    def __getitem__(self, k):
        if isinstance(k, slice):
            start = k.start or 0
            self._f.seek(start)
            n = max(0, k.stop - start)
            self.bytes_read += n
            return self._f.read(n)
        self._f.seek(k)
        b = self._f.read(1)
        if not b:
            raise IndexError(k)
        self.bytes_read += 1
        return b[0]


class _OffsetBuf:
    """Bytes-like over one base subtree's contiguous span, indexed by
    ABSOLUTE file offsets (child dptrs are absolute)."""

    def __init__(self, data: bytes, offset: int):
        self._d = data
        self._o = offset

    def __getitem__(self, k):
        if isinstance(k, slice):
            start = (k.start or 0) - self._o
            if start < 0:
                raise IndexError(k.start)
            return self._d[start : k.stop - self._o]
        i = k - self._o
        if i < 0:
            raise IndexError(k)
        return self._d[i]


def _check_header(buf) -> None:
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


def _walk(buf, pos: int, base: int, digs: list[int], value_de):
    """DFS over one subtree of a (bytes-like) disktree buffer.

    Hardened against corrupt/adversarial foreign files (this is an
    interchange format): a well-formed file can only nest ``MAX_RES``
    digits deep, and the writer emits every child strictly AFTER its
    parent record (writer.rs:66-70 backpatching), so a digit path
    deeper than 15 or a backward/self dptr means a pointer loop —
    raise instead of recursing unboundedly."""
    first = buf[pos]
    if first & 0x80:  # parent
        if len(digs) >= K.MAX_RES:
            raise ValueError(
                f"corrupt disktree: Parent node at digit depth {len(digs)}"
                f" (max {K.MAX_RES}) — pointer loop or truncated file"
            )
        present = [d for d in range(7) if (first >> d) & 1]
        p = pos + 1
        for d in present:
            dp = _dptr_read(buf, p)
            p += DPTR_SZ
            if dp <= pos:
                raise ValueError(
                    f"corrupt disktree: child dptr {dp} not past its parent"
                    f" at {pos} — children are always written after their"
                    " parent; backward pointer implies a cycle"
                )
            yield from _walk(buf, dp, base, digs + [d], value_de)
    else:
        vlen, n = varint_read(buf, pos)
        vb = buf[pos + n : pos + n + vlen]
        yield _cell_from_path(base, digs), (
            value_de(vb) if value_de else bytes(vb)
        )


def _base_ptrs(buf) -> list[int]:
    hdr = len(HDR_MAGIC) + 1
    return [_dptr_read(buf, hdr + DPTR_SZ * b) for b in range(NUM_BASE)]


def iter_disktree(
    path: str,
    value_de: Optional[Callable[[bytes], object]] = de_i64,
    stream: bool = False,
):
    """Yield (cell, value) in the file's DFS order — which equals the
    reference's iteration order (== ascending ``lo``).

    ``stream=True`` never materializes the file: per-base subtrees are
    read span-at-a-time via the 5-byte base pointers (subtrees are
    written contiguously in base order — both this writer and the
    reference's, writer.rs:55-70), so peak memory is one base subtree,
    not the file.  The path for reference-produced multi-GB files that
    would OOM the whole-buffer codec."""
    if not stream:
        with open(path, "rb") as f:
            buf = f.read()
        _check_header(buf)
        for b, dp in enumerate(_base_ptrs(buf)):
            if dp != 0:
                yield from _walk(buf, dp, b, [], value_de)
        return
    with open(path, "rb") as f:
        fbuf = _FileBuf(f)
        _check_header(fbuf)
        ptrs = _base_ptrs(fbuf)
        size = f.seek(0, 2)
        for b, dp, span_end in _base_spans(ptrs, size):
            f.seek(dp)
            sub = _OffsetBuf(f.read(span_end - dp), dp)
            yield from _walk(sub, dp, b, [], value_de)


def _base_spans(ptrs: list[int], file_size: int):
    """(base, dptr, span_end) for present bases: each subtree's bytes
    end where the next base's begin (contiguous base-order layout)."""
    present = [(dp, b) for b, dp in enumerate(ptrs) if dp != 0]
    present.sort()
    for i, (dp, b) in enumerate(present):
        end = present[i + 1][0] if i + 1 < len(present) else file_size
        yield b, dp, end


class DiskTreeFile:
    """Open handle over a disktree file that never loads it wholly:
    random-access ``get`` descends via seeks (sub-linear bytes read —
    the ``DiskTreeMap::get`` analogue), iteration streams per-base
    spans.  Usable as a context manager."""

    def __init__(self, path: str, value_de: Optional[Callable] = de_i64):
        self.path = path
        self._de = value_de
        self._f = open(path, "rb")
        self.buf = _FileBuf(self._f)
        _check_header(self.buf)

    def get(self, cell: int):
        return disktree_get(self.buf, cell, self._de)

    def contains(self, cell: int) -> bool:
        """``DiskTreeMap::contains`` (/root/reference/src/disktree/
        tree.rs): same descent as ``get``."""
        return disktree_get(self.buf, cell, None) is not None

    def descendants(self, cell: int):
        """``DiskTreeMap::descendants`` (/root/reference/src/disktree/
        tree.rs:123-131): the stored leaf covering ``cell`` if the
        probe is at-or-below it, else every stored leaf under ``cell``
        (DFS order == ascending lo); empty if neither.  Seek-based —
        reads only the probe's subtree."""
        _check_header(self.buf)
        base, digs = _digits_of(int(cell))
        pos = _dptr_read(self.buf, len(HDR_MAGIC) + 1 + DPTR_SZ * base)
        if pos == 0:
            return
        taken: list[int] = []
        while True:
            first = self.buf[pos]
            if not first & 0x80:  # leaf at-or-above the probe: covering hit
                vlen, n = varint_read(self.buf, pos)
                vb = self.buf[pos + n : pos + n + vlen]
                yield _cell_from_path(base, taken), (
                    self._de(vb) if self._de else bytes(vb)
                )
                return
            if len(taken) == len(digs):  # parent at the probe: whole subtree
                yield from _walk(self.buf, pos, base, taken, self._de)
                return
            d = digs[len(taken)]
            if not (first >> d) & 1:
                return
            skip = bin(first & ((1 << d) - 1)).count("1")
            pos = _dptr_read(self.buf, pos + 1 + DPTR_SZ * skip)
            taken.append(d)

    def __iter__(self):
        return iter_disktree(self.path, self._de, stream=True)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


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
    stream: bool = False,
) -> DataFrame:
    """Parse a disktree file into a (cell, value) DataFrame for
    distributed joins (S3/J3 source).  ``stream=True`` decodes without
    holding the whole file in memory (driver peak = one base subtree +
    the row list); for files too large even for the decoded *rows* on
    the driver, use :func:`read_disktree_distributed`."""
    rows = [(c, v) for c, v in iter_disktree(path, value_de, stream=stream)]
    return spark.createDataFrame(rows, f"cell: long, value: {value_type}")


def read_disktree_distributed(
    spark: SparkSession, path: str, value_type: str = "long"
) -> DataFrame:
    """Scale source for >RAM disktree files: one task per present base
    cell; each task seeks straight to its subtree span via the 5-byte
    base dptr and decodes only that span — no process ever materializes
    the whole file (the lazy-paging posture of
    /root/reference/src/disktree/tree.rs:33-37; 5-byte dptrs allow
    ~1 TiB files).  ``path`` must be visible from executors (shared or
    replicated FS).  Values are decoded as little-endian i64
    (``ser_i64``, the engine's default value codec) — arbitrary
    ``value_de`` callables don't belong in task closures; use
    :func:`iter_disktree` driver-side for exotic value types."""
    import pandas as pd

    if value_type != "long":
        # decoding is hardcoded to de_i64 — any other declared type
        # would mismatch the decoded int64s (Arrow conversion error or
        # silently mistyped column)
        raise ValueError(
            f"read_disktree_distributed decodes i64 values only"
            f" (value_type='long', got {value_type!r}); use iter_disktree"
            " with a custom value_de for other codecs"
        )
    with open(path, "rb") as f:
        fbuf = _FileBuf(f)
        _check_header(fbuf)
        ptrs = _base_ptrs(fbuf)
        size = f.seek(0, 2)
    spans = list(_base_spans(ptrs, size))
    if not spans:
        return spark.createDataFrame([], f"cell: long, value: {value_type}")

    def decode(batches):
        for pdf in batches:
            cells: list[int] = []
            vals: list[int] = []
            with open(path, "rb") as fh:
                for b, dp, end in zip(pdf["base"], pdf["dptr"], pdf["end"]):
                    fh.seek(int(dp))
                    sub = _OffsetBuf(fh.read(int(end) - int(dp)), int(dp))
                    for c, v in _walk(sub, int(dp), int(b), [], de_i64):
                        cells.append(c)
                        vals.append(v)
            yield pd.DataFrame({"cell": cells, "value": vals})

    bdf = spark.createDataFrame(
        [(b, dp, end) for b, dp, end in spans], "base: int, dptr: long, end: long"
    ).repartition(len(spans))
    return bdf.mapInPandas(decode, schema=f"cell long, value {value_type}")
