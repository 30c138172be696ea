"""Delta deletion-vector (DV) decoding — reader-side support for the
``deletionVectors`` table feature (Delta protocol spec, "Deletion
Vectors" + "Deletion Vector Descriptor Schema" sections; the most
common reason a delta-spark 3.x table is minReaderVersion=3: any modern
row-level DELETE/UPDATE/MERGE writes one).

A DV descriptor rides on an ``add`` action and names the set of ROW
INDEXES of that parquet file that are logically deleted. Three storage
forms (``storageType``):

- ``'i'``  — inline: ``pathOrInlineDv`` is the Z85-encoded DV data;
- ``'u'``  — relative: ``pathOrInlineDv`` is ``<optional random
  prefix><20-char Z85 uuid>``; the bytes live in
  ``<table>/<prefix>/deletion_vector_<uuid>.bin`` at ``offset``;
- ``'p'``  — absolute path to the ``.bin``.

On-disk ``.bin`` layout (format version byte 1, then per-DV frames):
``<int32 BE dataSize> <data> <int32 BE CRC-32(data)>`` with
``offset`` pointing at the size word. ``data`` is
``<int32 LE magic 1681511377><RoaringBitmapArray>`` where the bitmap
array is the 64-bit "portable" extension of the standard 32-bit
roaring format: ``<int64 LE n_bitmaps>`` then per bitmap
``<int32 LE high-key><standard roaring bitmap>``. The standard format
(RoaringFormatSpec) is fully parsed: array, bitmap and run containers,
both cookies, optional offset headers.

The serializer exists so golden fixtures and round-trip property tests
exercise the same byte format the parser reads (the sandbox has no
external Delta writer to produce one)."""

from __future__ import annotations

import os
import uuid as _uuid
import zlib
from typing import Any, Iterable

import numpy as np

# ZeroMQ Z85 alphabet — what delta-spark's Base85Codec uses
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

DV_MAGIC = 1681511377  # little-endian int32 prefix of every DV data blob
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    """Z85 over zero-padded 4-byte groups (decode truncates back via an
    explicit byte length, mirroring delta-spark's codec)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str, n_bytes: int) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        out += v.to_bytes(4, "big")
    if n_bytes > len(out):
        raise ValueError(f"Z85 payload shorter than expected {n_bytes}")
    return bytes(out[:n_bytes])


# --- 32-bit roaring bitmap (RoaringFormatSpec portable serialization) ---


def _parse_roaring32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one standard 32-bit roaring bitmap at ``pos``; returns the
    sorted uint32 values and the next read position."""
    cookie = int.from_bytes(buf[pos : pos + 4], "little")
    run_flag_bytes = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nbits = (n + 7) // 8
        run_flag_bytes = buf[pos : pos + nbits]
        pos += nbits
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")

    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        keys[i] = int.from_bytes(buf[pos : pos + 2], "little")
        cards[i] = int.from_bytes(buf[pos + 2 : pos + 4], "little") + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # container offsets — we read sequentially instead

    def is_run(i: int) -> bool:
        return bool(run_flag_bytes) and bool(
            run_flag_bytes[i // 8] & (1 << (i % 8))
        )

    parts: list[np.ndarray] = []
    for i in range(n):
        base = np.uint32(keys[i]) << np.uint32(16)
        if is_run(i):
            n_runs = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).astype(np.uint32)
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(runs[2 * j], runs[2 * j] + runs[2 * j + 1] + 1,
                              dtype=np.uint32)
                    for j in range(n_runs)
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] > 4096:
            bits = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            vals = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little")
            ).astype(np.uint32)
        else:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        parts.append(vals + (base.astype(np.uint32) | np.uint32(0)))
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, pos


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Standard portable serialization of a 32-bit roaring bitmap,
    choosing array/bitmap/run per container exactly by the format's own
    rules (runs win when they're the smallest encoding) so fixtures
    cover every container kind the parser must handle."""
    values = np.unique(values.astype(np.uint32))
    out = bytearray()
    groups: list[tuple[int, np.ndarray]] = []
    for key in np.unique(values >> np.uint32(16)):
        lows = (values[(values >> np.uint32(16)) == key] & np.uint32(0xFFFF)).astype(
            np.uint16
        )
        groups.append((int(key), lows))
    n = len(groups)

    containers: list[tuple[str, bytes, int]] = []
    for _key, lows in groups:
        card = len(lows)
        # run-length encode to decide
        diffs = np.diff(lows.astype(np.int64))
        n_runs = 1 + int((diffs != 1).sum()) if card else 0
        run_size = 2 + 4 * n_runs
        arr_size = 2 * card
        bmp_size = 8192
        if card and run_size < min(arr_size, bmp_size):
            body = bytearray(n_runs.to_bytes(2, "little"))
            start = prev = int(lows[0])
            for v in lows[1:]:
                v = int(v)
                if v != prev + 1:
                    body += start.to_bytes(2, "little")
                    body += (prev - start).to_bytes(2, "little")
                    start = v
                prev = v
            body += start.to_bytes(2, "little")
            body += (prev - start).to_bytes(2, "little")
            containers.append(("run", bytes(body), card))
        elif card > 4096:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[lows] = 1
            containers.append(
                ("bitmap", np.packbits(bits, bitorder="little").tobytes(), card)
            )
        else:
            containers.append(("array", lows.astype("<u2").tobytes(), card))

    has_run = any(k == "run" for k, _, _ in containers)
    if has_run:
        out += ((_SERIAL_COOKIE | ((n - 1) << 16))).to_bytes(4, "little")
        flags = bytearray((n + 7) // 8)
        for i, (k, _, _) in enumerate(containers):
            if k == "run":
                flags[i // 8] |= 1 << (i % 8)
        out += flags
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        out += _SERIAL_COOKIE_NO_RUN.to_bytes(4, "little")
        out += n.to_bytes(4, "little")
        has_offsets = True
    for (key, _lows), (_k, _body, card) in zip(groups, containers):
        out += key.to_bytes(2, "little")
        out += (card - 1).to_bytes(2, "little")
    if has_offsets:
        off = len(out) + 4 * n
        for _k, body, _c in containers:
            out += off.to_bytes(4, "little")
            off += len(body)
    for _k, body, _c in containers:
        out += body
    return bytes(out)


# --- 64-bit RoaringBitmapArray (the DV payload) ---


def roaring64_serialize(values: Iterable[int]) -> bytes:
    """DV data blob: magic + portable RoaringBitmapArray of int64 row
    indexes (grouped by high-32 key)."""
    arr = np.unique(np.asarray(list(values), dtype=np.int64))
    if arr.size and arr.min() < 0:
        raise ValueError("row indexes must be non-negative")
    u = arr.astype(np.uint64)
    highs = np.unique(u >> np.uint64(32))
    out = bytearray(DV_MAGIC.to_bytes(4, "little"))
    out += int(len(highs)).to_bytes(8, "little")
    for h in highs:
        lows = (u[(u >> np.uint64(32)) == h] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out += int(h).to_bytes(4, "little")
        out += _serialize_roaring32(lows)
    return bytes(out)


def roaring64_deserialize(data: bytes) -> np.ndarray:
    """Inverse of ``roaring64_serialize``: DV data blob → sorted int64
    row indexes."""
    magic = int.from_bytes(data[:4], "little")
    if magic != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {magic} (expected {DV_MAGIC})"
        )
    n_bitmaps = int.from_bytes(data[4:12], "little")
    pos = 12
    parts: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        high = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        lows, pos = _parse_roaring32(data, pos)
        parts.append(lows.astype(np.int64) + (high << 32))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(parts))


# --- descriptor resolution ---


def dv_file_path(table_path: str, path_or_inline: str) -> str:
    """Resolve a storageType='u' descriptor to its ``.bin`` path: the
    LAST 20 chars are the Z85 uuid, anything before is the random
    directory prefix."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc, 16))
    name = f"deletion_vector_{u}.bin"
    return (
        os.path.join(table_path, prefix, name)
        if prefix
        else os.path.join(table_path, name)
    )


def deleted_row_indexes(table_path: str, desc: dict[str, Any]) -> np.ndarray:
    """Decode one DV descriptor to its sorted int64 deleted row indexes
    (CRC-verified for on-disk forms)."""
    st = desc.get("storageType")
    size = int(desc["sizeInBytes"])
    if st == "i":
        data = z85_decode(desc["pathOrInlineDv"], size)
    elif st in ("u", "p"):
        p = (
            dv_file_path(table_path, desc["pathOrInlineDv"])
            if st == "u"
            else desc["pathOrInlineDv"]
        )
        # offset is OPTIONAL per the spec and may round-trip as an
        # explicit null through a parquet checkpoint (struct fields are
        # never stripped, only nulled) — both absent and None mean the
        # default frame position right after the format-version byte
        off = desc.get("offset")
        with open(p, "rb") as f:
            f.seek(int(off) if off is not None else 1)
            frame_size = int.from_bytes(f.read(4), "big")
            if frame_size != size:
                raise ValueError(
                    f"DV frame size {frame_size} != descriptor sizeInBytes "
                    f"{size} at {p}"
                )
            data = f.read(frame_size)
            crc = int.from_bytes(f.read(4), "big")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch at {p}")
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    vals = roaring64_deserialize(data)
    card = int(desc.get("cardinality", len(vals)))
    if card != len(vals):
        raise ValueError(
            f"DV cardinality {card} != decoded {len(vals)} — refusing a "
            "bitmap that disagrees with its descriptor"
        )
    return vals


def write_dv_file(table_path: str, dvs: list[np.ndarray]) -> list[dict[str, Any]]:
    """Write one ``.bin`` holding each bitmap as a sequential frame and
    return the matching storageType='u' descriptors (fixture/test
    helper — the engine itself does not WRITE deletion vectors)."""
    u = _uuid.uuid4()
    rel = f"deletion_vector_{u}.bin"
    descs: list[dict[str, Any]] = []
    buf = bytearray(b"\x01")  # format version byte
    for vals in dvs:
        data = roaring64_serialize(vals)
        offset = len(buf)
        buf += len(data).to_bytes(4, "big")
        buf += data
        buf += (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
        descs.append(
            {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(u.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": int(len(np.unique(vals))),
            }
        )
    with open(os.path.join(table_path, rel), "wb") as f:
        f.write(bytes(buf))
    return descs


def inline_dv_descriptor(vals: np.ndarray) -> dict[str, Any]:
    """storageType='i' descriptor for a row-index set (fixture/test
    helper)."""
    data = roaring64_serialize(vals)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": int(len(np.unique(vals))),
    }
