"""A vendored, fully independent minimal Parquet reader (interop oracle).

Purpose (round-4 VERDICT item 9): the framework's core claim — indexed
files remain plain, valid Parquet readable by third-party engines
(/root/reference/README.md:9-11) — must not rest solely on pyarrow
round-trips, and this zero-egress environment has no DuckDB. This module
is the independent check: a from-scratch reader of the Parquet subset the
golden fixture uses (compact-Thrift footer, PLAIN encoding, uncompressed
pages, RLE/bit-packed def/rep levels) that imports NOTHING from
pqvector_tpu and nothing from pyarrow.

It is a test oracle, not a product reader: unsupported features raise.
"""

from __future__ import annotations

import struct

# --------------------------- compact thrift ---------------------------
# Spec: https://github.com/apache/thrift compact protocol. Types:
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        d = self.buf[self.pos : self.pos + n]
        if len(d) != n:
            raise ValueError("truncated thrift data")
        self.pos += n
        return d

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)


def _read_value(cur: _Cursor, ctype: int):
    if ctype in (_CT_TRUE, _CT_FALSE):
        return ctype == _CT_TRUE
    if ctype == _CT_BYTE:
        return struct.unpack("b", cur.take(1))[0]
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        return cur.zigzag()
    if ctype == _CT_DOUBLE:
        return struct.unpack("<d", cur.take(8))[0]
    if ctype == _CT_BINARY:
        return cur.take(cur.varint())
    if ctype in (_CT_LIST, _CT_SET):
        head = cur.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = cur.varint()
        return [_read_value(cur, etype) for _ in range(size)]
    if ctype == _CT_STRUCT:
        return _read_struct(cur)
    if ctype == _CT_MAP:
        size = cur.varint()
        if size == 0:
            return {}
        kv = cur.byte()
        kt, vt = kv >> 4, kv & 0x0F
        return {
            _read_value(cur, kt): _read_value(cur, vt) for _ in range(size)
        }
    raise ValueError(f"unsupported thrift compact type {ctype}")


def _read_struct(cur: _Cursor) -> dict:
    """A struct as {field_id: value}; bools inline in the field header."""
    out: dict[int, object] = {}
    fid = 0
    while True:
        head = cur.byte()
        if head == _CT_STOP:
            return out
        delta = head >> 4
        ctype = head & 0x0F
        fid = fid + delta if delta else cur.zigzag()
        out[fid] = _read_value(cur, ctype)


# ----------------------------- parquet --------------------------------

PLAIN = 0


class Column:
    def __init__(self, name, ptype, max_def, max_rep):
        self.name = name
        self.ptype = ptype
        self.max_def = max_def
        self.max_rep = max_rep


def _schema_leaves(elements: list[dict]):
    """Flatten the SchemaElement tree into leaf columns with dotted names
    and max def/rep levels. SchemaElement: 1=type 3=repetition 4=name
    5=num_children (parquet.thrift)."""
    leaves = []
    pos = [1]  # skip root

    def walk(prefix, d, r):
        el = elements[pos[0]]
        pos[0] += 1
        rep = el.get(3, 0)  # 0=REQUIRED 1=OPTIONAL 2=REPEATED
        d += 1 if rep in (1, 2) else 0
        r += 1 if rep == 2 else 0
        name = el[4].decode()
        path = f"{prefix}.{name}" if prefix else name
        kids = el.get(5, 0)
        if kids:
            for _ in range(kids):
                walk(path, d, r)
        else:
            leaves.append(Column(path, el.get(1), d, r))

    nroot = elements[0].get(5, 0)
    for _ in range(nroot):
        walk("", 0, 0)
    return leaves


def _hybrid_levels(data: bytes, bit_width: int, count: int) -> list[int]:
    """RLE/bit-packed hybrid decode of exactly ``count`` levels."""
    if bit_width == 0:
        return [0] * count
    cur = _Cursor(data)
    out: list[int] = []
    width_bytes = (bit_width + 7) // 8
    while len(out) < count:
        header = cur.varint()
        if header & 1:  # bit-packed groups of 8
            n = (header >> 1) * 8
            raw = cur.take((n * bit_width + 7) // 8)
            acc = int.from_bytes(raw, "little")
            mask = (1 << bit_width) - 1
            for i in range(n):
                if len(out) >= count:
                    break
                out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            n = header >> 1
            val = int.from_bytes(cur.take(width_bytes), "little")
            out.extend([val] * n)
    return out[:count]


class MiniParquet:
    """Reader for the golden fixture's subset: UNCOMPRESSED + PLAIN."""

    def __init__(self, data: bytes):
        self.data = data
        if data[:4] != b"PAR1" or data[-4:] != b"PAR1":
            raise ValueError("not a parquet file")
        meta_len = struct.unpack("<I", data[-8:-4])[0]
        meta = _read_struct(
            _Cursor(data[len(data) - 8 - meta_len : len(data) - 8])
        )
        self.num_rows = meta[3]
        self.leaves = _schema_leaves(meta[2])
        self.row_groups = meta[4]
        self.key_value = {
            kv[1].decode(): kv.get(2, b"").decode() for kv in meta.get(5, [])
        }

    def _leaf(self, first: str) -> tuple[int, Column]:
        for i, leaf in enumerate(self.leaves):
            if leaf.name.split(".")[0] == first:
                return i, leaf
        raise KeyError(first)

    def _chunk_pages(self, col_chunk: dict, leaf: Column):
        """Yield (num_values, def_levels, rep_levels, values_bytes) per
        data page of one column chunk. ColumnMetaData: 4=codec
        9=data_page_offset 11=dictionary_page_offset; PageHeader: 1=type
        2=uncompressed 3=compressed 5=DataPageHeader(1=num_values
        2=encoding)."""
        md = col_chunk[3]
        if md[4] != 0:
            raise ValueError("minireader supports UNCOMPRESSED only")
        off = min(md[9], md.get(11, md[9]))
        remaining = md[5]
        while remaining > 0:
            cur = _Cursor(self.data, off)
            header = _read_struct(cur)
            body = self.data[cur.pos : cur.pos + header[3]]
            off = cur.pos + header[3]
            if header[1] != 0:  # only DATA_PAGE(0) carries values here
                raise ValueError(f"unsupported page type {header[1]}")
            dph = header[5]
            nvals = dph[1]
            if dph[2] != PLAIN:
                raise ValueError("minireader supports PLAIN only")
            pos = 0
            rep = [0] * nvals
            if leaf.max_rep > 0:
                ln = struct.unpack("<I", body[pos : pos + 4])[0]
                rep = _hybrid_levels(
                    body[pos + 4 : pos + 4 + ln],
                    (leaf.max_rep).bit_length(),
                    nvals,
                )
                pos += 4 + ln
            dl = [leaf.max_def] * nvals
            if leaf.max_def > 0:
                ln = struct.unpack("<I", body[pos : pos + 4])[0]
                dl = _hybrid_levels(
                    body[pos + 4 : pos + 4 + ln],
                    (leaf.max_def).bit_length(),
                    nvals,
                )
                pos += 4 + ln
            yield nvals, dl, rep, body[pos:]
            remaining -= nvals

    def read_float_lists(self, column: str) -> list[list[float]]:
        """Decode a List<Float32> column into per-row python lists."""
        idx, leaf = self._leaf(column)
        if leaf.ptype != 4:  # parquet Type.FLOAT
            raise ValueError("expected FLOAT leaf")
        rows: list[list[float]] = []
        for rg in self.row_groups:
            for nvals, dl, rep, vals in self._chunk_pages(
                rg[1][idx], leaf
            ):
                flat = struct.unpack(
                    f"<{len(vals) // 4}f", vals[: len(vals) // 4 * 4]
                )
                vi = 0
                for i in range(nvals):
                    if rep[i] == 0:
                        rows.append([])
                    if dl[i] == leaf.max_def:
                        rows[-1].append(flat[vi])
                        vi += 1
        return rows

    def read_int64(self, column: str) -> list[int]:
        idx, leaf = self._leaf(column)
        if leaf.ptype != 2:  # parquet Type.INT64
            raise ValueError("expected INT64 leaf")
        out: list[int] = []
        for rg in self.row_groups:
            for nvals, dl, _rep, vals in self._chunk_pages(
                rg[1][idx], leaf
            ):
                flat = struct.unpack(
                    f"<{len(vals) // 8}q", vals[: len(vals) // 8 * 8]
                )
                vi = 0
                for i in range(nvals):
                    if dl[i] == leaf.max_def:
                        out.append(flat[vi])
                        vi += 1
                    else:
                        out.append(None)
        return out

    # -------------------- pq-vector payload (independent) --------------

    def read_pq_vector_index(self):
        """Decode the embedded IVF payload straight from the format
        contract (magic + u64 LE length + LE index bytes — the layout the
        reference writes, /root/reference/src/ivf/parquet.rs:105-112,
        /root/reference/src/ivf/index.rs:65-128)."""
        off = int(self.key_value["pq_vector_index_offset"])
        col = self.key_value["pq_vector_embedding_column"]
        magic = b"PQ_VECTOR1"
        if self.data[off : off + len(magic)] != magic:
            raise ValueError("bad index payload magic")
        (plen,) = struct.unpack(
            "<Q", self.data[off + 10 : off + 18]
        )
        body = self.data[off + 18 : off + 18 + plen]
        dim, k = struct.unpack("<II", body[:8])
        pos = 8
        centroids = struct.unpack(f"<{dim * k}f", body[pos : pos + 4 * dim * k])
        pos += 4 * dim * k
        lists = []
        for _ in range(k):
            (ln,) = struct.unpack("<I", body[pos : pos + 4])
            pos += 4
            lists.append(
                list(struct.unpack(f"<{ln}I", body[pos : pos + 4 * ln]))
            )
            pos += 4 * ln
        if pos != len(body):
            raise ValueError("trailing bytes in index payload")
        return col, dim, k, centroids, lists
