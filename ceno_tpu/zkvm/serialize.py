"""Canonical ZKVMProof byte serialization.

The reference derives `ZKVMProof: Serialize` and measures proof size via
`bincode::serialize(&proof).len()` (ceno_zkvm/src/scheme.rs:119,
benches/fibonacci.rs:55-63).  This module is the TPU build's analog: a
deterministic, versioned, self-describing binary encoding of the proof
object graph — the same bytes for the same proof regardless of device
placement — plus the exact round-trip decoder.

Format (little-endian throughout):
  [4-byte magic "CTP1"]
  value :=
    tag  u8
    0x00 None
    0x01 int      (zigzag varint)
    0x02 bool     (u8)
    0x03 str      (varint len + utf8)
    0x04 Gl       (varint ndim, varint dims..., canonical u64 LE data)
    0x05 Gl2      (Gl c0, Gl c1)
    0x06 list     (varint len + values)
    0x07 tuple    (varint len + values)
    0x08 dict     (varint len + sorted (key, value) pairs)
    0x09 bytes    (varint len + raw)
    0x10+ registered struct (fields in declaration order)

Field elements serialize in canonical (fully reduced, < p) u64 form, so two
equal proofs with different limb representations encode identically.
"""

from __future__ import annotations

import struct
from typing import Any, List

import jax
import numpy as np

from ..field import gl
from ..field.gl import Gl
from ..field.gl2 import Gl2

MAGIC = b"CTP1"

_TAG_NONE = 0x00
_TAG_INT = 0x01
_TAG_BOOL = 0x02
_TAG_STR = 0x03
_TAG_GL = 0x04
_TAG_GL2 = 0x05
_TAG_LIST = 0x06
_TAG_TUPLE = 0x07
_TAG_DICT = 0x08
_TAG_BYTES = 0x09
_TAG_STRUCT0 = 0x10

# struct registry: declaration order IS the wire order; append-only
def _registry():
    from ..pcs.basefold import (
        BasefoldCommitment,
        BasefoldProof,
        BatchedQueryOpens,
        CommQueryOpen,
        QueryOpens,
    )
    from ..sumcheck.prover import SumcheckProof
    from .scheme.prover import OpcodeProof
    from .scheme.table_prover import TableProof
    from .scheme.tower import TowerProofs
    from .structs import ZKVMProof

    return [
        ZKVMProof,
        OpcodeProof,
        TableProof,
        TowerProofs,
        BasefoldProof,
        QueryOpens,
        BasefoldCommitment,
        SumcheckProof,
        BatchedQueryOpens,
        CommQueryOpen,
    ]


def _varint(n: int) -> bytes:
    assert n >= 0
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _zigzag(n: int) -> bytes:
    return _varint((n << 1) ^ (n >> 63) if n < 0 else n << 1)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        assert len(b) == n, "truncated proof bytes"
        self.pos += n
        return b

    def varint(self) -> int:
        n = shift = 0
        while True:
            b = self.take(1)[0]
            n |= (b & 0x7F) << shift
            if not (b & 0x80):
                return n
            shift += 7

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)


def _gl_bytes(x: Gl) -> bytes:
    arr = np.asarray(jax.device_get(gl.to_u64(x)), dtype="<u8")
    out = [_varint(arr.ndim)]
    for d in arr.shape:
        out.append(_varint(d))
    out.append(arr.tobytes())
    return b"".join(out)


def _read_gl(r: _Reader) -> Gl:
    ndim = r.varint()
    shape = tuple(r.varint() for _ in range(ndim))
    n = int(np.prod(shape)) if shape else 1
    arr = np.frombuffer(r.take(8 * n), dtype="<u8").reshape(shape)
    return gl.from_u64(arr.astype(np.uint64))


def _encode(v: Any, out: List[bytes], tags: dict) -> None:
    t = type(v)
    if v is None:
        out.append(bytes([_TAG_NONE]))
    elif t is bool or isinstance(v, np.bool_):
        out.append(bytes([_TAG_BOOL, 1 if v else 0]))
    elif isinstance(v, (int, np.integer)):
        out.append(bytes([_TAG_INT]))
        out.append(_zigzag(int(v)))
    elif t is str:
        b = v.encode()
        out.append(bytes([_TAG_STR]))
        out.append(_varint(len(b)))
        out.append(b)
    elif t is bytes:
        out.append(bytes([_TAG_BYTES]))
        out.append(_varint(len(v)))
        out.append(v)
    elif t is Gl:
        out.append(bytes([_TAG_GL]))
        out.append(_gl_bytes(v))
    elif t is Gl2:
        out.append(bytes([_TAG_GL2]))
        out.append(_gl_bytes(v.c0))
        out.append(_gl_bytes(v.c1))
    elif t in tags:
        out.append(bytes([tags[t]]))
        if hasattr(t, "_fields"):  # NamedTuple: declaration order
            for f in v:
                _encode(f, out, tags)
        else:  # dataclass
            import dataclasses

            for f in dataclasses.fields(t):
                _encode(getattr(v, f.name), out, tags)
    elif t is list:
        out.append(bytes([_TAG_LIST]))
        out.append(_varint(len(v)))
        for x in v:
            _encode(x, out, tags)
    elif t is tuple:
        out.append(bytes([_TAG_TUPLE]))
        out.append(_varint(len(v)))
        for x in v:
            _encode(x, out, tags)
    elif t is dict:
        out.append(bytes([_TAG_DICT]))
        out.append(_varint(len(v)))
        for k in sorted(v):
            _encode(k, out, tags)
            _encode(v[k], out, tags)
    else:
        raise TypeError(f"cannot serialize {t.__name__} in a proof")


def _decode(r: _Reader, classes: list) -> Any:
    tag = r.take(1)[0]
    if tag == _TAG_NONE:
        return None
    if tag == _TAG_INT:
        return r.zigzag()
    if tag == _TAG_BOOL:
        return bool(r.take(1)[0])
    if tag == _TAG_STR:
        return r.take(r.varint()).decode()
    if tag == _TAG_BYTES:
        return bytes(r.take(r.varint()))
    if tag == _TAG_GL:
        return _read_gl(r)
    if tag == _TAG_GL2:
        return Gl2(_read_gl(r), _read_gl(r))
    if tag == _TAG_LIST:
        return [_decode(r, classes) for _ in range(r.varint())]
    if tag == _TAG_TUPLE:
        return tuple(_decode(r, classes) for _ in range(r.varint()))
    if tag == _TAG_DICT:
        return {
            k: v
            for k, v in (
                (_decode(r, classes), _decode(r, classes))
                for _ in range(r.varint())
            )
        }
    idx = tag - _TAG_STRUCT0
    assert 0 <= idx < len(classes), f"unknown struct tag {tag:#x}"
    cls = classes[idx]
    if hasattr(cls, "_fields"):  # NamedTuple
        return cls(*(_decode(r, classes) for _ in cls._fields))
    import dataclasses

    fields = dataclasses.fields(cls)
    return cls(*(_decode(r, classes) for _ in fields))


def serialize_proof(proof) -> bytes:
    """ZKVMProof -> canonical bytes."""
    classes = _registry()
    tags = {c: _TAG_STRUCT0 + i for i, c in enumerate(classes)}
    out: List[bytes] = [MAGIC]
    _encode(proof, out, tags)
    return b"".join(out)


def deserialize_proof(data: bytes):
    """Canonical bytes -> ZKVMProof (exact round trip)."""
    assert data[:4] == MAGIC, "bad proof magic"
    r = _Reader(data)
    r.pos = 4
    obj = _decode(r, _registry())
    assert r.pos == len(data), "trailing bytes after proof"
    return obj


def proof_size_bytes(proof) -> int:
    return len(serialize_proof(proof))
