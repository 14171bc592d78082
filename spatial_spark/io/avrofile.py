"""Minimal Avro Object Container File codec — pure Python, no deps.

Implements exactly the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that Apache
Iceberg's metadata files use: records of primitive fields, nullable
unions ``["null", T]``, arrays of records, and ``map<bytes>`` keyed
by stringified ints (Iceberg bounds maps are written as the spec's
``k*_v*`` key/value arrays — see below).  Container framing per the
spec: ``Obj\\x01`` magic, a file-metadata map carrying
``avro.schema`` / ``avro.codec``, a random 16-byte sync marker, then
data blocks of ``(count, byte_size, records..., sync)``.

Binary encoding (spec §"Binary Encoding"):

* int/long — zigzag varint;
* float/double — IEEE little-endian 4/8 bytes;
* boolean — one byte; null — zero bytes;
* bytes/string — varint length + data;
* record — fields in declared order, no framing;
* array/map — one or more blocks of (varint count, items), a zero
  count terminates; negative counts (size-prefixed blocks) are
  accepted on read, never written;
* union — varint branch index + the branch's encoding.

Iceberg writes its ``map<int, bytes>`` column-bounds maps as an
*array of key/value records* (logical type ``map``), because Avro
map keys must be strings — this module follows that convention via
schemas that declare the array-of-record form explicitly, so no
special casing is needed here.

Codec support: ``null`` (written) and ``deflate`` (read) — every
engine must write ``null``-codec-readable files per the spec, and
deflate is the only other required codec.

No reference parity — the reference has no Avro/Iceberg surface
(grepped); the contract is the public Avro spec.
"""
from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------
# primitive encoders
# --------------------------------------------------------------------
def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("avro: truncated varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


# --------------------------------------------------------------------
# schema-driven value codec
# --------------------------------------------------------------------
def _encode(schema, v, out: bytearray) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            out += _zigzag(int(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "bytes":
            out += _enc_bytes(bytes(v))
        elif t == "string":
            out += _enc_str(v)
        else:
            raise ValueError(f"avro: unsupported primitive {t!r}")
        return
    if isinstance(schema, list):                      # union
        if v is None and "null" in schema:
            idx = schema.index("null")
            out += _zigzag(idx)
            return
        for i, br in enumerate(schema):
            if br == "null":
                continue
            out += _zigzag(i)
            _encode(br, v, out)
            return
        raise ValueError("avro: no non-null union branch")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            fv = v.get(f["name"]) if isinstance(v, dict) else None
            if fv is None and "default" in f and \
                    not isinstance(f["type"], list):
                fv = f["default"]
            _encode(f["type"], fv, out)
    elif t == "array":
        items = list(v or [])
        if items:
            out += _zigzag(len(items))
            for it in items:
                _encode(schema["items"], it, out)
        out += _zigzag(0)
    elif t == "map":
        entries = dict(v or {})
        if entries:
            out += _zigzag(len(entries))
            for k, mv in entries.items():
                out += _enc_str(str(k))
                _encode(schema["values"], mv, out)
        out += _zigzag(0)
    elif t in ("int", "long", "string", "bytes", "double", "float",
               "boolean", "null"):
        _encode(t, v, out)                            # wrapped primitive
    elif t == "fixed":
        b = bytes(v)
        if len(b) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        out += b
    else:
        raise ValueError(f"avro: unsupported complex type {t!r}")


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) != b"\x00"
        if t in ("int", "long"):
            return _read_zigzag(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return buf.read(_read_zigzag(buf))
        if t == "string":
            return buf.read(_read_zigzag(buf)).decode("utf-8")
        raise ValueError(f"avro: unsupported primitive {t!r}")
    if isinstance(schema, list):
        return _decode(schema[_read_zigzag(buf)], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                return out
            if n < 0:                  # size-prefixed block
                _read_zigzag(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                return out
            if n < 0:
                _read_zigzag(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_read_zigzag(buf)).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
    if t == "fixed":
        return buf.read(schema["size"])
    if t in ("int", "long", "string", "bytes", "double", "float",
             "boolean", "null"):
        return _decode(t, buf)
    raise ValueError(f"avro: unsupported complex type {t!r}")


# --------------------------------------------------------------------
# container file
# --------------------------------------------------------------------
def write_avro(path: str, schema: dict, records: list,
               metadata: dict | None = None) -> int:
    """Write ``records`` as a null-codec Avro container file; returns
    the byte size.  ``metadata``: extra file-metadata entries (str or
    bytes values) — Iceberg manifests carry their table schema and
    partition spec here."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    # deterministic sync marker derived from content (no RNG; files
    # are single-writer temp-then-move like every sink in this repo)
    import hashlib
    sync = hashlib.md5(
        schema_json.encode() + str(len(records)).encode()).digest()
    meta = {"avro.schema": schema_json, "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    body = bytearray()
    body += _MAGIC
    mm = bytearray()
    mm += _zigzag(len(meta))
    for k, v in meta.items():
        mm += _enc_str(k)
        mm += _enc_bytes(v.encode("utf-8") if isinstance(v, str)
                         else bytes(v))
    mm += _zigzag(0)
    body += mm
    body += sync
    if records:
        blk = bytearray()
        for r in records:
            _encode(schema, r, blk)
        body += _zigzag(len(records))
        body += _zigzag(len(blk))
        body += blk
        body += sync
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(body)
    os.replace(tmp, path)
    return len(body)


def read_avro(path_or_bytes) -> tuple[dict, list, dict]:
    """Read an Avro container file → (schema, records, file_metadata).
    Accepts a path or raw bytes.  Codecs: null, deflate."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta = {}
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:
            _read_zigzag(buf)
            n = -n
        for _ in range(n):
            k = buf.read(_read_zigzag(buf)).decode("utf-8")
            meta[k] = buf.read(_read_zigzag(buf))
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro: codec {codec!r} not implemented (null/deflate "
            "are the spec-required pair)")
    sync = buf.read(16)
    records = []
    while buf.tell() < len(raw):
        n = _read_zigzag(buf)
        size = _read_zigzag(buf)
        blob = buf.read(size)
        if codec == "deflate":
            blob = zlib.decompress(blob, -15)
        bb = io.BytesIO(blob)
        for _ in range(n):
            records.append(_decode(schema, bb))
        if buf.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    mstr = {k: v for k, v in meta.items() if k != "avro.schema"}
    return schema, records, mstr
