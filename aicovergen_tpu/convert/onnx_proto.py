"""Minimal ONNX protobuf wire-format reader/writer (no onnx/protobuf deps).

The MDX separation checkpoints are .onnx files the reference executes as a
black box through ONNX Runtime (reference src/mdx.py:74-77).  This module
parses the protobuf wire format directly into a light graph structure that
models/mdx.py traces into a single XLA program.  The writer emits the same
subset (useful for tests and for exporting models from this framework).

Covered messages: ModelProto, GraphProto, NodeProto, AttributeProto,
TensorProto, ValueInfoProto (shapes only).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# TensorProto.DataType
DT_FLOAT, DT_UINT8, DT_INT8, DT_INT32, DT_INT64, DT_BOOL, DT_FLOAT16, DT_DOUBLE = (
    1, 2, 3, 6, 7, 9, 10, 11,
)
_DTYPE_MAP = {
    DT_FLOAT: np.float32,
    DT_UINT8: np.uint8,
    DT_INT8: np.int8,
    DT_INT32: np.int32,
    DT_INT64: np.int64,
    DT_BOOL: np.bool_,
    DT_FLOAT16: np.float16,
    DT_DOUBLE: np.float64,
}
_DTYPE_REV = {np.dtype(v): k for k, v in _DTYPE_MAP.items()}

# AttributeProto.AttributeType
ATTR_FLOAT, ATTR_INT, ATTR_STRING, ATTR_TENSOR, ATTR_GRAPH = 1, 2, 3, 4, 5
ATTR_FLOATS, ATTR_INTS, ATTR_STRINGS = 6, 7, 8


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        elif wtype == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wtype == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def _packed_or_repeated_ints(wtype: int, val) -> List[int]:
    if wtype == 0:
        return [val]
    out = []
    pos = 0
    while pos < len(val):
        v, pos = _read_varint(val, pos)
        out.append(v)
    return out


def _zigzag64(v: int) -> int:
    """int64 values are stored two's-complement in varints."""
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# graph structures
# ---------------------------------------------------------------------------


@dataclass
class OnnxAttr:
    name: str
    type: int = 0
    f: float = 0.0
    i: int = 0
    s: bytes = b""
    t: Optional[np.ndarray] = None
    floats: List[float] = field(default_factory=list)
    ints: List[int] = field(default_factory=list)
    strings: List[bytes] = field(default_factory=list)

    @property
    def value(self):
        return {
            ATTR_FLOAT: self.f,
            ATTR_INT: self.i,
            ATTR_STRING: self.s,
            ATTR_TENSOR: self.t,
            ATTR_FLOATS: self.floats,
            ATTR_INTS: self.ints,
            ATTR_STRINGS: self.strings,
        }.get(self.type)


@dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    attrs: Dict[str, OnnxAttr] = field(default_factory=dict)

    def attr(self, name, default=None):
        a = self.attrs.get(name)
        return default if a is None else a.value


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]
    inputs: List[str]
    outputs: List[str]
    input_shapes: Dict[str, List[Optional[int]]] = field(default_factory=dict)
    name: str = ""


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    data_type = DT_FLOAT
    raw = None
    name = ""
    float_data: List[float] = []
    int32_data: List[int] = []
    int64_data: List[int] = []
    double_data: List[float] = []
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1:
            dims.extend(_packed_or_repeated_ints(wtype, val))
        elif fnum == 2:
            data_type = val
        elif fnum == 4:
            if wtype == 2:
                float_data.extend(np.frombuffer(val, "<f4").tolist())
            else:
                float_data.append(struct.unpack("<f", bytes(val))[0])
        elif fnum == 5:
            int32_data.extend(_packed_or_repeated_ints(wtype, val))
        elif fnum == 7:
            int64_data.extend(
                _zigzag64(v) for v in _packed_or_repeated_ints(wtype, val)
            )
        elif fnum == 8:
            name = bytes(val).decode()
        elif fnum == 9:
            raw = bytes(val)
        elif fnum == 10:
            if wtype == 2:
                double_data.extend(np.frombuffer(val, "<f8").tolist())
            else:
                double_data.append(struct.unpack("<d", bytes(val))[0])
    dtype = _DTYPE_MAP.get(data_type)
    if dtype is None:
        raise ValueError(f"unsupported tensor dtype {data_type} ({name})")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder("<")).astype(dtype)
    elif float_data:
        arr = np.asarray(float_data, np.float32)
    elif int64_data:
        arr = np.asarray(int64_data, np.int64)
    elif int32_data:
        arr = np.asarray(int32_data, np.int32)
    elif double_data:
        arr = np.asarray(double_data, np.float64)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims).astype(dtype, copy=False)


def _parse_attr(buf: memoryview) -> OnnxAttr:
    attr = OnnxAttr(name="")
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1:
            attr.name = bytes(val).decode()
        elif fnum == 20:
            attr.type = val
        elif fnum == 2:
            attr.f = struct.unpack("<f", bytes(val))[0]
            attr.type = attr.type or ATTR_FLOAT
        elif fnum == 3:
            attr.i = _zigzag64(val)
            attr.type = attr.type or ATTR_INT
        elif fnum == 4:
            attr.s = bytes(val)
            attr.type = attr.type or ATTR_STRING
        elif fnum == 5:
            attr.t = _parse_tensor(val)[1]
            attr.type = attr.type or ATTR_TENSOR
        elif fnum == 7:
            if wtype == 2:
                attr.floats.extend(np.frombuffer(val, "<f4").tolist())
            else:
                attr.floats.append(struct.unpack("<f", bytes(val))[0])
            attr.type = attr.type or ATTR_FLOATS
        elif fnum == 8:
            attr.ints.extend(_zigzag64(v) for v in _packed_or_repeated_ints(wtype, val))
            attr.type = attr.type or ATTR_INTS
        elif fnum == 9:
            attr.strings.append(bytes(val))
            attr.type = attr.type or ATTR_STRINGS
    return attr


def _parse_node(buf: memoryview) -> OnnxNode:
    node = OnnxNode(op_type="", inputs=[], outputs=[])
    for fnum, _wtype, val in _iter_fields(buf):
        if fnum == 1:
            node.inputs.append(bytes(val).decode())
        elif fnum == 2:
            node.outputs.append(bytes(val).decode())
        elif fnum == 3:
            node.name = bytes(val).decode()
        elif fnum == 4:
            node.op_type = bytes(val).decode()
        elif fnum == 5:
            attr = _parse_attr(val)
            node.attrs[attr.name] = attr
    return node


def _parse_value_info(buf: memoryview) -> Tuple[str, List[Optional[int]]]:
    name = ""
    shape: List[Optional[int]] = []
    for fnum, _w, val in _iter_fields(buf):
        if fnum == 1:
            name = bytes(val).decode()
        elif fnum == 2:  # TypeProto
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 1:  # tensor_type
                    for f3, _w3, v3 in _iter_fields(v2):
                        if f3 == 2:  # shape: TensorShapeProto
                            for f4, _w4, v4 in _iter_fields(v3):
                                if f4 == 1:  # dim
                                    dim_val: Optional[int] = None
                                    for f5, _w5, v5 in _iter_fields(v4):
                                        if f5 == 1:
                                            dim_val = v5
                                    shape.append(dim_val)
    return name, shape


def _parse_graph(buf: memoryview) -> OnnxGraph:
    nodes: List[OnnxNode] = []
    initializers: Dict[str, np.ndarray] = {}
    inputs: List[str] = []
    outputs: List[str] = []
    input_shapes: Dict[str, List[Optional[int]]] = {}
    name = ""
    for fnum, _wtype, val in _iter_fields(buf):
        if fnum == 1:
            nodes.append(_parse_node(val))
        elif fnum == 2:
            name = bytes(val).decode()
        elif fnum == 5:
            tname, arr = _parse_tensor(val)
            initializers[tname] = arr
        elif fnum == 11:
            iname, shape = _parse_value_info(val)
            inputs.append(iname)
            input_shapes[iname] = shape
        elif fnum == 12:
            outputs.append(_parse_value_info(val)[0])
    # graph inputs include initializers in old opsets; keep only real inputs
    real_inputs = [i for i in inputs if i not in initializers]
    return OnnxGraph(
        nodes=nodes,
        initializers=initializers,
        inputs=real_inputs,
        outputs=outputs,
        input_shapes=input_shapes,
        name=name,
    )


def read_onnx(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        data = memoryview(f.read())
    graph = None
    for fnum, _wtype, val in _iter_fields(data):
        if fnum == 7:  # ModelProto.graph
            graph = _parse_graph(val)
    if graph is None:
        raise ValueError(f"{path}: no graph found (not an ONNX model?)")
    return graph


# ---------------------------------------------------------------------------
# writer (tests + export)
# ---------------------------------------------------------------------------


def _w_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_key(out: bytearray, fnum: int, wtype: int):
    _w_varint(out, (fnum << 3) | wtype)


def _w_bytes(out: bytearray, fnum: int, data: bytes):
    _w_key(out, fnum, 2)
    _w_varint(out, len(data))
    out += data


def _w_str(out: bytearray, fnum: int, s: str):
    _w_bytes(out, fnum, s.encode())


def _w_int(out: bytearray, fnum: int, v: int):
    _w_key(out, fnum, 0)
    _w_varint(out, v & ((1 << 64) - 1) if v < 0 else v)


def _ser_tensor(name: str, arr: np.ndarray) -> bytes:
    out = bytearray()
    for d in arr.shape:
        _w_int(out, 1, d)
    _w_int(out, 2, _DTYPE_REV[np.dtype(arr.dtype)])
    _w_str(out, 8, name)
    _w_bytes(out, 9, np.ascontiguousarray(arr).tobytes())
    return bytes(out)


def _ser_attr(attr_name: str, value) -> bytes:
    out = bytearray()
    _w_str(out, 1, attr_name)
    if isinstance(value, float):
        _w_key(out, 2, 5)
        out += struct.pack("<f", value)
        _w_int(out, 20, ATTR_FLOAT)
    elif isinstance(value, bool) or isinstance(value, (int, np.integer)):
        _w_int(out, 3, int(value))
        _w_int(out, 20, ATTR_INT)
    elif isinstance(value, (bytes, str)):
        _w_bytes(out, 4, value.encode() if isinstance(value, str) else value)
        _w_int(out, 20, ATTR_STRING)
    elif isinstance(value, np.ndarray):
        _w_bytes(out, 5, _ser_tensor(attr_name + "_t", value))
        _w_int(out, 20, ATTR_TENSOR)
    elif isinstance(value, (list, tuple)) and value and isinstance(value[0], float):
        for v in value:
            _w_key(out, 7, 5)
            out += struct.pack("<f", v)
        _w_int(out, 20, ATTR_FLOATS)
    elif isinstance(value, (list, tuple)):
        for v in value:
            _w_int(out, 8, int(v))
        _w_int(out, 20, ATTR_INTS)
    else:
        raise TypeError(f"unsupported attr type {type(value)}")
    return bytes(out)


def _ser_node(op_type: str, inputs, outputs, attrs: dict) -> bytes:
    out = bytearray()
    for i in inputs:
        _w_str(out, 1, i)
    for o in outputs:
        _w_str(out, 2, o)
    _w_str(out, 4, op_type)
    for k, v in attrs.items():
        _w_bytes(out, 5, _ser_attr(k, v))
    return bytes(out)


def _ser_value_info(name: str, shape) -> bytes:
    dims = bytearray()
    for d in shape:
        dim = bytearray()
        if d is not None:
            _w_int(dim, 1, d)
        _w_bytes(dims, 1, bytes(dim))
    tensor_type = bytearray()
    _w_int(tensor_type, 1, DT_FLOAT)
    _w_bytes(tensor_type, 2, bytes(dims))
    type_proto = bytearray()
    _w_bytes(type_proto, 1, bytes(tensor_type))
    out = bytearray()
    _w_str(out, 1, name)
    _w_bytes(out, 2, bytes(type_proto))
    return bytes(out)


def write_onnx(
    path: str,
    nodes: List[Tuple[str, list, list, dict]],
    initializers: Dict[str, np.ndarray],
    inputs: Dict[str, list],
    outputs: List[str],
    graph_name: str = "graph",
) -> None:
    """nodes: [(op_type, inputs, outputs, attrs)]."""
    graph = bytearray()
    for op_type, ins, outs, attrs in nodes:
        _w_bytes(graph, 1, _ser_node(op_type, ins, outs, attrs))
    _w_str(graph, 2, graph_name)
    for name, arr in initializers.items():
        _w_bytes(graph, 5, _ser_tensor(name, arr))
    for name, shape in inputs.items():
        _w_bytes(graph, 11, _ser_value_info(name, shape))
    for name in outputs:
        _w_bytes(graph, 12, _ser_value_info(name, []))

    model = bytearray()
    _w_int(model, 1, 8)  # ir_version
    opset = bytearray()
    _w_str(opset, 1, "")
    _w_int(opset, 2, 13)
    _w_bytes(model, 8, bytes(opset))
    _w_bytes(model, 7, bytes(graph))
    with open(path, "wb") as f:
        f.write(bytes(model))
