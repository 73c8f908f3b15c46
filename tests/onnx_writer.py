"""Minimal ONNX *writer* (test fixture).

Serializes a name->array mapping as a valid ModelProto with graph
initializers, following onnx.proto3's wire format independently of the
reader under test.  Used to exercise the production ONNX reader without
the ``onnx`` package (unavailable in this environment).
"""

import struct

import numpy as np

_NP_TO_ONNX = {
    np.dtype("float32"): 1,
    np.dtype("uint8"): 2,
    np.dtype("int8"): 3,
    np.dtype("int16"): 5,
    np.dtype("int32"): 6,
    np.dtype("int64"): 7,
    np.dtype("bool"): 9,
    np.dtype("float16"): 10,
    np.dtype("float64"): 11,
}


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def tensor_proto(
    name: str, arr: np.ndarray, use_raw: bool = True
) -> bytes:
    out = bytearray()
    for d in arr.shape:
        out += _key(1, 0) + _varint(d)  # dims (unpacked)
    dtype_code = _NP_TO_ONNX[arr.dtype]
    out += _key(2, 0) + _varint(dtype_code)
    out += _len_field(8, name.encode("utf-8"))
    if use_raw:
        out += _len_field(9, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
    elif arr.dtype == np.float32:
        # packed float_data
        payload = struct.pack(f"<{arr.size}f", *arr.reshape(-1).tolist())
        out += _len_field(4, payload)
    elif arr.dtype == np.int64:
        payload = b"".join(
            _varint(int(v) & ((1 << 64) - 1)) for v in arr.reshape(-1)
        )
        out += _len_field(7, payload)
    else:
        raise ValueError(f"non-raw not supported for {arr.dtype}")
    return bytes(out)


def constant_node(output_name: str, arr: np.ndarray) -> bytes:
    tensor = tensor_proto("", arr)
    attr = _len_field(1, b"value") + _len_field(5, tensor)
    node = (
        _len_field(2, output_name.encode())
        + _len_field(4, b"Constant")
        + _len_field(5, attr)
    )
    return node


def write_onnx(
    path: str,
    initializers: dict,
    constants: dict = (),
    use_raw: bool = True,
) -> None:
    graph = bytearray()
    for name, arr in dict(constants or {}).items():
        graph += _len_field(1, constant_node(name, np.asarray(arr)))
    for name, arr in initializers.items():
        graph += _len_field(
            5, tensor_proto(name, np.asarray(arr), use_raw=use_raw)
        )
    model = bytearray()
    model += _key(1, 0) + _varint(8)  # ir_version
    model += _len_field(2, b"mimic3-tpu-test")  # producer_name
    model += _len_field(7, bytes(graph))
    with open(path, "wb") as f:
        f.write(bytes(model))
