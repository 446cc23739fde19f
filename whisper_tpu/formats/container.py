"""Legacy ggml single-file model container: shared low-level record I/O.

The reference stores every model (whisper, parakeet, silero-vad) in the same
"legacy ggml" container: a `0x67676d6c` magic, a model-family-specific header,
then a flat stream of tensor records
``{i32 n_dims, i32 name_len, i32 ggml_type, i32 ne[n_dims], name, raw bytes}``
(reference: src/whisper.cpp:1485-1962 reader, models/convert-pt-to-ggml.py:268-333
writer).  `ne` is in ggml order: ne[0] is the contiguous innermost dimension,
so a C-ordered numpy array of shape ``s`` has ``ne == s[::-1]``.

Header parsing lives with each model family; this module provides the shared
scalar/tensor record codecs plus the in-memory :class:`TensorRecord`.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass
from typing import BinaryIO, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from . import quants

GGML_FILE_MAGIC = 0x67676D6C  # 'ggml'


def read_i32(f: BinaryIO) -> int:
    b = f.read(4)
    if len(b) != 4:
        raise EOFError("unexpected end of model file")
    return struct.unpack("<i", b)[0]


def read_u32(f: BinaryIO) -> int:
    b = f.read(4)
    if len(b) != 4:
        raise EOFError("unexpected end of model file")
    return struct.unpack("<I", b)[0]


def read_f32(f: BinaryIO) -> float:
    b = f.read(4)
    if len(b) != 4:
        raise EOFError("unexpected end of model file")
    return struct.unpack("<f", b)[0]


def write_i32(f: BinaryIO, v: int) -> None:
    f.write(struct.pack("<i", v))


def write_f32(f: BinaryIO, v: float) -> None:
    f.write(struct.pack("<f", v))


def check_magic(f: BinaryIO) -> None:
    magic = read_u32(f)
    if magic != GGML_FILE_MAGIC:
        raise ValueError(f"invalid model file: bad magic 0x{magic:08x}")


@dataclass
class TensorRecord:
    """One tensor record from a legacy ggml file.

    `shape` is in numpy (row-major) convention — the reverse of the on-disk
    ggml `ne` order.  `data` is the raw packed byte payload in the tensor's
    ggml_type encoding.
    """

    name: str
    ggml_type: int
    shape: Tuple[int, ...]
    data: bytes

    @property
    def n_elems(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n

    @property
    def nbytes(self) -> int:
        return len(self.data)

    def to_f32(self) -> np.ndarray:
        """Decode to a float32 numpy array of `shape`."""
        return quants.dequantize(self.data, self.ggml_type, self.n_elems).reshape(self.shape)

    def to_planes(self) -> "quants.QTensor":
        return quants.unpack_to_planes(self.data, self.ggml_type, self.shape)


def read_tensor_records(f: BinaryIO) -> Iterator[TensorRecord]:
    """Stream tensor records until EOF (reference: src/whisper.cpp:1845-1943)."""
    while True:
        head = f.read(4)
        if len(head) == 0:
            return
        if len(head) != 4:
            raise EOFError("truncated tensor record header")
        n_dims = struct.unpack("<i", head)[0]
        name_len = read_i32(f)
        ggml_type = read_i32(f)
        # n_dims == 0 is a scalar tensor (silero final_conv_bias);
        # reference accepts 0 <= n_dims <= 4 (src/whisper.cpp:5034)
        if not (0 <= n_dims <= 4):
            raise ValueError(f"bad tensor rank {n_dims}")
        ne = [read_i32(f) for _ in range(n_dims)]
        name = f.read(name_len).decode("utf-8")
        shape = tuple(reversed(ne))
        n_elems = 1
        for s in ne:
            n_elems *= s
        nbytes = quants.row_size(ggml_type, n_elems)
        data = f.read(nbytes)
        if len(data) != nbytes:
            raise EOFError(f"truncated tensor data for '{name}'")
        yield TensorRecord(name, ggml_type, shape, data)


def write_tensor_record(
    f: BinaryIO,
    name: str,
    array: Optional[np.ndarray] = None,
    ggml_type: Optional[int] = None,
    *,
    raw: Optional[bytes] = None,
    shape: Optional[Sequence[int]] = None,
) -> None:
    """Append one tensor record.

    Either pass a numpy `array` (quantized/converted to `ggml_type`, default
    f32), or pre-packed `raw` bytes with an explicit `shape`.
    """
    if raw is None:
        assert array is not None
        if ggml_type is None:
            ggml_type = (
                quants.GGML_TYPE_F16 if array.dtype == np.float16 else quants.GGML_TYPE_F32
            )
        shape = array.shape
        raw = quants.quantize(np.asarray(array, dtype=np.float32), ggml_type)
    assert shape is not None and ggml_type is not None
    ne = list(reversed([int(s) for s in shape]))
    name_b = name.encode("utf-8")
    f.write(struct.pack("<iii", len(ne), len(name_b), ggml_type))
    for d in ne:
        f.write(struct.pack("<i", d))
    f.write(name_b)
    f.write(raw)
