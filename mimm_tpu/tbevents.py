"""Dependency-free TensorBoard scalar event writer.

SURVEY.md §5 calls for "scalars per step/epoch to JSONL + optional
TensorBoard" (the reference has neither — its observability is matplotlib
PNGs + log files, utils.py:29-40).  The JSONL half lives in
``metrics.MetricWriter``; this module supplies the TensorBoard half.

Why hand-rolled: the in-image TensorBoard writers come via
``torch.utils.tensorboard``, and importing torch into the training process
alongside jaxlib corrupts the heap (oneDNN and XLA:CPU in one address
space — the torch-oracle parity tests run torch in a subprocess for the
same reason), while ``tensorflow`` drags a second full runtime into every
trainer.  The tfevents wire format is small and stable: TFRecord framing
(little-endian length + masked crc32c checksums) around ``Event`` protobuf
messages carrying ``Summary``/``simple_value`` scalars.  Encoding it
directly is ~100 lines and adds zero dependencies; the output loads in
stock TensorBoard (round-tripped through
``tensorboard.backend.event_processing.event_accumulator`` in
tests/test_metrics_and_cam.py).

Wire layout (tensorflow/core/util/event.proto,
tensorflow/core/framework/summary.proto, TFRecord from
tensorflow/core/lib/io/record_writer.cc):

    Event:         double wall_time = 1; int64 step = 2;
                   string file_version = 3; Summary summary = 5;
    Summary:       repeated Value value = 1;
    Summary.Value: string tag = 1; float simple_value = 2;
    TFRecord:      uint64le len, uint32le masked_crc32c(len bytes),
                   data, uint32le masked_crc32c(data)
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# ---------------------------------------------------------------------------
# crc32c (Castagnoli, reflected poly 0x82F63B78) — table-driven pure python
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    """TFRecord's rotated+offset crc mask (record_writer.cc MaskedCrc)."""
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf encoding (only the wire types the Event message needs)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF  # proto int64 two's complement
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_double(num: int, v: float) -> bytes:
    return _varint((num << 3) | 1) + struct.pack("<d", v)


def _field_float(num: int, v: float) -> bytes:
    return _varint((num << 3) | 5) + struct.pack("<f", v)


def _field_varint(num: int, v: int) -> bytes:
    return _varint(num << 3) + _varint(v)


def _field_bytes(num: int, v: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(v)) + v


def _scalar_event(wall_time: float, step: int, tag: str, value: float) -> bytes:
    summary_value = (_field_bytes(1, tag.encode("utf-8")) +
                     _field_float(2, float(value)))
    summary = _field_bytes(1, summary_value)
    return (_field_double(1, wall_time) + _field_varint(2, int(step)) +
            _field_bytes(5, summary))


def _version_event(wall_time: float) -> bytes:
    return _field_double(1, wall_time) + _field_bytes(3, b"brain.Event:2")


class TBEventWriter:
    """Append-only scalar writer producing a standard
    ``events.out.tfevents.<ts>.<host>`` file under ``logdir``."""

    def __init__(self, logdir: str, filename_suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        now = time.time()
        name = (f"events.out.tfevents.{int(now)}."
                f"{socket.gethostname()}{filename_suffix}")
        self.path = os.path.join(logdir, name)
        self._fh = open(self.path, "ab")
        self._record(_version_event(now))

    def _record(self, event: bytes) -> None:
        header = struct.pack("<Q", len(event))
        self._fh.write(header + struct.pack("<I", _masked_crc(header)) +
                       event + struct.pack("<I", _masked_crc(event)))

    def scalar(self, tag: str, value: float, step: int,
               wall_time: Optional[float] = None) -> None:
        if wall_time is None:  # NOT falsy-or: an explicit 0.0 is a valid stamp
            wall_time = time.time()
        self._record(_scalar_event(wall_time, step, tag, float(value)))

    def flush(self) -> None:
        self._fh.flush()

    def close(self) -> None:
        if not self._fh.closed:
            self._fh.flush()
            self._fh.close()
