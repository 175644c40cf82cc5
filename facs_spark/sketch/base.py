"""Mergeable-sketch protocol shared by all aggregators.

Every sketch is a small, fixed-size, *mergeable* summary with an
associative, commutative ``merge`` — the property that lets Spark
build partials per partition (map-side), combine them in a shuffle
tree, and produce the same answer for any partitioning of the input.
The reference's Bloom build is single-threaded (``facs/build.c``);
merge is the operation this engine adds to distribute it.

Serialization frame (all sketches): ``magic(4s) | version(u16) |
payload`` where payload is sketch-specific.  Blobs travel through
Spark as ``BinaryType`` columns.
"""

from __future__ import annotations

import struct
from typing import Protocol, TypeVar

import numpy as np

S = TypeVar("S", bound="Sketch")

_HDR = struct.Struct("<4sH")


class Sketch(Protocol):
    """update_batch / merge / to_bytes / from_bytes / error bound."""

    MAGIC: bytes

    def update_batch(self, values) -> None: ...
    def merge(self: S, other: S) -> S: ...
    def to_bytes(self) -> bytes: ...
    @classmethod
    def from_bytes(cls: type[S], blob: bytes) -> S: ...


def frame(magic: bytes, version: int, payload: bytes) -> bytes:
    return _HDR.pack(magic, version) + payload


def unframe(magic: bytes, blob: bytes) -> tuple[int, bytes]:
    got, version = _HDR.unpack_from(blob)
    if got != magic:
        raise ValueError(f"bad sketch magic {got!r}, expected {magic!r}")
    return version, blob[_HDR.size:]


def pack_array(a: np.ndarray) -> bytes:
    dt = str(a.dtype).encode()
    return struct.pack("<B", len(dt)) + dt + struct.pack("<Q", a.size) + a.tobytes()


def unpack_array(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    (dlen,) = struct.unpack_from("<B", buf, offset)
    offset += 1
    dt = buf[offset : offset + dlen].decode()
    offset += dlen
    (size,) = struct.unpack_from("<Q", buf, offset)
    offset += 8
    nbytes = size * np.dtype(dt).itemsize
    a = np.frombuffer(buf, dtype=dt, count=size, offset=offset).copy()
    return a, offset + nbytes
