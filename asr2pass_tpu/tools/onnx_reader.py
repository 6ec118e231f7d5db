"""Dependency-free ONNX model reader + minimal JAX graph executor.

The reference ships several auxiliary ONNX models (the DNSMOS MOS scorers
in utils/DNSMOS/*.onnx used by utils/dnsmos_local.py, and the exported
FunASR model dirs its servers auto-download). This module reads the ONNX
protobuf container with a hand-rolled wire-format parser (no `onnx` /
`onnxruntime` dependency) and provides:

  * read_onnx(path) -> OnnxGraph: initializers {name: np.ndarray}, nodes
    (op_type, inputs, outputs, attrs), graph inputs/outputs. Use this to
    convert ONNX checkpoints into our npz model dirs
    (tools/convert_funasr.py accepts .onnx via this reader — torch.onnx
    export keeps the module-qualified parameter names).
  * OnnxExecutor: a small jit-able executor covering the op set of the
    auxiliary models (conv/pool/gemm/activations/normalization/...) so
    e.g. DNSMOS runs natively on JAX (tools/quality.py). It is NOT a
    general ONNX runtime — unsupported ops raise with the op name.

Wire format: each field = varint key (field_no << 3 | wire_type);
wire types 0=varint 1=fixed64 2=length-delimited 5=fixed32.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# --------------------------------------------------------------------------
# protobuf wire-format primitives
# --------------------------------------------------------------------------


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


def _fields(buf: memoryview):
    """Yield (field_no, wire_type, value) over a message buffer.
    value: int for varint/fixed, memoryview for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:  # groups (3/4) don't occur in onnx
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def _packed_varints(val) -> List[int]:
    out = []
    pos = 0
    while pos < len(val):
        v, pos = _read_varint(val, pos)
        out.append(v)
    return out


def _zigzag64(v: int) -> int:
    # onnx int64 fields are plain (not zigzag); keep two's complement
    return v - (1 << 64) if v >= (1 << 63) else v


# --------------------------------------------------------------------------
# ONNX messages
# --------------------------------------------------------------------------

_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw: Optional[bytes] = None
    float_data: List[float] = []
    int_data: List[int] = []
    for fno, wt, val in _fields(buf):
        if fno == 1:
            if wt == 0:
                dims.append(_zigzag64(val))
            else:
                dims.extend(_zigzag64(v) for v in _packed_varints(val))
        elif fno == 2 and wt == 0:
            dtype = val
        elif fno == 4:  # float_data (packed)
            float_data.extend(
                np.frombuffer(bytes(val), dtype="<f4").tolist()
                if wt == 2 else
                [np.frombuffer(val.to_bytes(4, "little"), "<f4")[0]])
        elif fno in (5, 7):  # int32_data / int64_data (packed varints)
            if wt == 2:
                int_data.extend(_zigzag64(v) for v in _packed_varints(val))
            else:
                int_data.append(_zigzag64(val))
        elif fno == 8 and wt == 2:
            name = bytes(val).decode("utf-8")
        elif fno == 9 and wt == 2:
            raw = bytes(val)
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif float_data:
        arr = np.asarray(float_data, dtype=np_dtype)
    elif int_data:
        arr = np.asarray(int_data, dtype=np_dtype)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    if dims:
        arr = arr.reshape(dims)
    elif arr.size == 1:
        # empty dims = rank-0 scalar in the proto; frombuffer yields (1,)
        arr = arr.reshape(())
    return name, arr


def _parse_attribute(buf: memoryview) -> Tuple[str, object]:
    name = ""
    value: object = None
    ints: List[int] = []
    floats: List[float] = []
    strings: List[bytes] = []
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            name = bytes(val).decode("utf-8")
        elif fno == 2 and wt == 5:  # f
            value = np.frombuffer(val.to_bytes(4, "little"), "<f4")[0]
        elif fno == 3 and wt == 0:  # i
            value = _zigzag64(val)
        elif fno == 4 and wt == 2:  # s
            value = bytes(val)
        elif fno == 5 and wt == 2:  # t (tensor)
            value = _parse_tensor(val)[1]
        elif fno == 7:  # floats
            if wt == 2:
                floats.extend(np.frombuffer(bytes(val), "<f4").tolist())
            else:
                floats.append(
                    np.frombuffer(val.to_bytes(4, "little"), "<f4")[0])
        elif fno == 8:  # ints
            if wt == 2:
                ints.extend(_zigzag64(v) for v in _packed_varints(val))
            else:
                ints.append(_zigzag64(val))
        elif fno == 9 and wt == 2:  # strings
            strings.append(bytes(val))
    if ints:
        value = ints
    elif floats:
        value = floats
    elif strings and value is None:
        value = strings
    return name, value


@dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    attrs: Dict[str, object]
    name: str = ""


@dataclass
class OnnxGraph:
    initializers: Dict[str, np.ndarray] = field(default_factory=dict)
    nodes: List[OnnxNode] = field(default_factory=list)
    inputs: List[str] = field(default_factory=list)
    outputs: List[str] = field(default_factory=list)
    input_shapes: Dict[str, List[Optional[int]]] = field(default_factory=dict)


def _parse_value_info(buf: memoryview):
    name = ""
    shape: List[Optional[int]] = []
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            name = bytes(val).decode("utf-8")
        elif fno == 2 and wt == 2:  # TypeProto
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:  # tensor_type
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 2 and w3 == 2:  # shape
                            for f4, w4, v4 in _fields(v3):
                                if f4 == 1 and w4 == 2:  # dim
                                    dv: Optional[int] = None
                                    for f5, w5, v5 in _fields(v4):
                                        if f5 == 1 and w5 == 0:
                                            dv = _zigzag64(v5)
                                    shape.append(dv)
    return name, shape


def _parse_node(buf: memoryview) -> OnnxNode:
    node = OnnxNode(op_type="", inputs=[], outputs=[], attrs={})
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            node.inputs.append(bytes(val).decode("utf-8"))
        elif fno == 2 and wt == 2:
            node.outputs.append(bytes(val).decode("utf-8"))
        elif fno == 3 and wt == 2:
            node.name = bytes(val).decode("utf-8")
        elif fno == 4 and wt == 2:
            node.op_type = bytes(val).decode("utf-8")
        elif fno == 5 and wt == 2:
            k, v = _parse_attribute(val)
            node.attrs[k] = v
    return node


def _parse_graph(buf: memoryview) -> OnnxGraph:
    g = OnnxGraph()
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            g.nodes.append(_parse_node(val))
        elif fno == 5 and wt == 2:
            name, arr = _parse_tensor(val)
            g.initializers[name] = arr
        elif fno == 11 and wt == 2:
            name, shape = _parse_value_info(val)
            g.inputs.append(name)
            g.input_shapes[name] = shape
        elif fno == 12 and wt == 2:
            name, _ = _parse_value_info(val)
            g.outputs.append(name)
    # graph "inputs" include initializers in older opsets; drop them
    g.inputs = [n for n in g.inputs if n not in g.initializers]
    return g


def read_onnx(path: str) -> OnnxGraph:
    """Parse a .onnx file into an OnnxGraph (initializers as numpy)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    for fno, wt, val in _fields(buf):
        if fno == 7 and wt == 2:  # ModelProto.graph
            return _parse_graph(val)
    raise ValueError(f"{path}: no graph found (not an ONNX model?)")


# --------------------------------------------------------------------------
# Minimal JAX executor (op set of the auxiliary models)
# --------------------------------------------------------------------------


class OnnxExecutor:
    """Execute an OnnxGraph with jax.numpy (nodes are in topological
    order per the ONNX spec). Covers the DNSMOS-family op set plus the op
    set torch.onnx.export emits for FunASR-style Paraformer graphs
    (LayerNormalization/Softmax/Gather/Shape/Where/NonZero/...), used by
    tools/convert_funasr.py --verify to execute a source model.onnx as the
    conversion oracle. Raises NotImplementedError naming any other op.
    `jax.jit(executor)` works for static graphs; graphs with
    data-dependent shapes (NonZero/dynamic pads) must run eagerly."""

    def __init__(self, graph: OnnxGraph):
        self.g = graph

    def __call__(self, *inputs):
        import jax.numpy as jnp

        env: Dict[str, object] = dict(self.g.initializers)
        for name, x in zip(self.g.inputs, inputs):
            env[name] = x

        def get(n):
            return env[n] if n else None

        for node in self.g.nodes:
            t = node.op_type
            i = node.inputs
            a = node.attrs
            if t in ("Identity", "Dropout"):
                out = get(i[0])
            elif t == "Cast":
                to = _DTYPES.get(int(a.get("to", 1)), np.float32)
                out = jnp.asarray(get(i[0])).astype(to)
            elif t == "Add":
                out = jnp.add(get(i[0]), get(i[1]))
            elif t == "Mul":
                out = jnp.multiply(get(i[0]), get(i[1]))
            elif t == "Div":
                out = jnp.divide(get(i[0]), get(i[1]))
            elif t == "Sub":
                out = jnp.subtract(get(i[0]), get(i[1]))
            elif t == "Max":
                out = get(i[0])
                for other in i[1:]:
                    out = jnp.maximum(out, get(other))
            elif t == "Sqrt":
                out = jnp.sqrt(get(i[0]))
            elif t == "Pow":
                out = jnp.power(get(i[0]), get(i[1]))
            elif t == "Log":
                out = jnp.log(get(i[0]))
            elif t == "Relu":
                out = jnp.maximum(get(i[0]), 0)
            elif t == "Sigmoid":
                import jax

                out = jax.nn.sigmoid(get(i[0]))
            elif t == "MatMul":
                out = jnp.matmul(get(i[0]), get(i[1]))
            elif t == "Gemm":
                x, w = jnp.asarray(get(i[0])), jnp.asarray(get(i[1]))
                if a.get("transA"):
                    x = x.T
                if a.get("transB"):
                    w = w.T
                out = jnp.matmul(x, w) * float(a.get("alpha", 1.0))
                if len(i) > 2:
                    out = out + jnp.asarray(get(i[2])) * float(
                        a.get("beta", 1.0))
            elif t == "Transpose":
                out = jnp.transpose(get(i[0]), a.get("perm"))
            elif t == "Unsqueeze":
                axes = a.get("axes") or [int(v) for v in
                                         np.asarray(get(i[1])).tolist()]
                out = get(i[0])
                for ax in sorted(axes):
                    out = jnp.expand_dims(out, ax)
            elif t == "Squeeze":
                axes = a.get("axes") or ([int(v) for v in
                                          np.asarray(get(i[1])).tolist()]
                                         if len(i) > 1 else None)
                out = jnp.squeeze(get(i[0]), tuple(axes) if axes else None)
            elif t == "Reshape":
                x = get(i[0])
                shape = [int(v) for v in np.asarray(get(i[1])).tolist()]
                if not a.get("allowzero"):
                    # ONNX: a 0 entry copies the corresponding input dim
                    shape = [jnp.shape(x)[k] if d == 0 else d
                             for k, d in enumerate(shape)]
                out = jnp.reshape(x, shape)
            elif t == "Concat":
                out = jnp.concatenate([get(n) for n in i],
                                      axis=int(a.get("axis", 0)))
            elif t == "Slice":
                x = get(i[0])
                if len(i) > 1:  # opset >= 10: tensors
                    starts = np.asarray(get(i[1])).tolist()
                    ends = np.asarray(get(i[2])).tolist()
                    axes = (np.asarray(get(i[3])).tolist()
                            if len(i) > 3 and i[3] else
                            list(range(len(starts))))
                    steps = (np.asarray(get(i[4])).tolist()
                             if len(i) > 4 and i[4] else [1] * len(starts))
                else:  # opset 1: attributes
                    starts, ends = a["starts"], a["ends"]
                    axes = a.get("axes", list(range(len(starts))))
                    steps = [1] * len(starts)
                idx = [slice(None)] * x.ndim
                for s, e, ax, st in zip(starts, ends, axes, steps):
                    big = 1 << 62
                    e = None if e >= big else e
                    idx[int(ax)] = slice(int(s), None if e is None
                                         else int(e), int(st))
                out = x[tuple(idx)]
            elif t == "ReduceMax":
                axes = a.get("axes")
                out = jnp.max(get(i[0]),
                              axis=tuple(axes) if axes else None,
                              keepdims=bool(a.get("keepdims", 1)))
            elif t == "ReduceMean":
                axes = a.get("axes")
                out = jnp.mean(get(i[0]),
                               axis=tuple(axes) if axes else None,
                               keepdims=bool(a.get("keepdims", 1)))
            elif t == "GlobalAveragePool":
                x = get(i[0])
                out = jnp.mean(x, axis=tuple(range(2, x.ndim)),
                               keepdims=True)
            elif t == "Flatten":
                x = get(i[0])
                ax = int(a.get("axis", 1))
                out = jnp.reshape(x, (int(np.prod(x.shape[:ax])), -1))
            elif t == "Conv":
                out = self._conv(get(i[0]), get(i[1]),
                                 get(i[2]) if len(i) > 2 else None, a)
            elif t == "MaxPool":
                out = self._pool(get(i[0]), a, reducer="max")
            elif t == "AveragePool":
                out = self._pool(get(i[0]), a, reducer="mean")
            elif t == "Constant":
                out = a.get("value")
                if out is None:  # value_float / value_int forms
                    out = a.get("value_float", a.get("value_int"))
                out = np.asarray(out)
            elif t == "Shape":
                x = get(i[0])
                out = np.asarray(np.shape(x), np.int64)
            elif t == "ConstantOfShape":
                shape = [int(v) for v in np.asarray(get(i[0])).tolist()]
                fill = a.get("value")
                out = (jnp.zeros(shape, np.float32) if fill is None else
                       jnp.full(shape, np.asarray(fill).reshape(()).item(),
                                np.asarray(fill).dtype))
            elif t == "Expand":
                shape = [int(v) for v in np.asarray(get(i[1])).tolist()]
                out = jnp.broadcast_to(
                    get(i[0]), np.broadcast_shapes(
                        tuple(shape), jnp.shape(get(i[0]))))
            elif t == "Range":
                s, e, d = (np.asarray(get(n)).reshape(()).item()
                           for n in i[:3])
                out = jnp.arange(s, e, d)
            elif t == "Tile":
                reps = [int(v) for v in np.asarray(get(i[1])).tolist()]
                out = jnp.tile(get(i[0]), reps)
            elif t == "Gather":
                ax = int(a.get("axis", 0))
                out = jnp.take(get(i[0]), jnp.asarray(get(i[1]),
                                                      jnp.int32), axis=ax)
            elif t == "NonZero":
                out = np.stack(np.nonzero(np.asarray(get(i[0])))
                               ).astype(np.int64)
            elif t == "LayerNormalization":
                x = jnp.asarray(get(i[0]))
                ax = int(a.get("axis", -1))
                eps = float(a.get("epsilon", 1e-5))
                mu = jnp.mean(x, axis=ax, keepdims=True)
                var = jnp.mean((x - mu) ** 2, axis=ax, keepdims=True)
                out = (x - mu) / jnp.sqrt(var + eps)
                out = out * jnp.asarray(get(i[1]))
                if len(i) > 2 and i[2]:
                    out = out + jnp.asarray(get(i[2]))
            elif t == "Softmax":
                import jax

                out = jax.nn.softmax(jnp.asarray(get(i[0])),
                                     axis=int(a.get("axis", -1)))
            elif t == "Erf":
                import jax

                out = jax.scipy.special.erf(jnp.asarray(
                    get(i[0]), jnp.float32))
            elif t in ("Sin", "Cos", "Tanh", "Neg", "Exp", "Floor", "Ceil",
                       "Round", "Reciprocal", "Abs", "Not"):
                fn = {"Sin": jnp.sin, "Cos": jnp.cos, "Tanh": jnp.tanh,
                      "Neg": jnp.negative, "Exp": jnp.exp,
                      "Floor": jnp.floor, "Ceil": jnp.ceil,
                      "Round": jnp.round, "Reciprocal": lambda x: 1.0 / x,
                      "Abs": jnp.abs, "Not": jnp.logical_not}[t]
                out = fn(jnp.asarray(get(i[0])))
            elif t in ("Equal", "Greater", "GreaterOrEqual", "Less",
                       "LessOrEqual", "And", "Or"):
                fn = {"Equal": jnp.equal, "Greater": jnp.greater,
                      "GreaterOrEqual": jnp.greater_equal,
                      "Less": jnp.less, "LessOrEqual": jnp.less_equal,
                      "And": jnp.logical_and, "Or": jnp.logical_or}[t]
                out = fn(jnp.asarray(get(i[0])), jnp.asarray(get(i[1])))
            elif t == "Where":
                out = jnp.where(jnp.asarray(get(i[0])), get(i[1]),
                                get(i[2]))
            elif t == "Min":
                out = get(i[0])
                for other in i[1:]:
                    out = jnp.minimum(out, get(other))
            elif t == "Clip":
                lo = get(i[1]) if len(i) > 1 and i[1] else a.get("min")
                hi = get(i[2]) if len(i) > 2 and i[2] else a.get("max")
                out = jnp.clip(get(i[0]),
                               None if lo is None else jnp.asarray(lo),
                               None if hi is None else jnp.asarray(hi))
            elif t in ("ReduceSum", "ReduceMin", "ReduceProd"):
                # opset >= 13 passes axes as a second input
                axes = a.get("axes")
                if axes is None and len(i) > 1 and i[1]:
                    axes = [int(v) for v in np.asarray(get(i[1])).tolist()]
                fn = {"ReduceSum": jnp.sum, "ReduceMin": jnp.min,
                      "ReduceProd": jnp.prod}[t]
                out = fn(jnp.asarray(get(i[0])),
                         axis=tuple(axes) if axes else None,
                         keepdims=bool(a.get("keepdims", 1)))
            elif t == "ArgMax":
                out = jnp.argmax(jnp.asarray(get(i[0])),
                                 axis=int(a.get("axis", 0)),
                                 keepdims=bool(a.get("keepdims", 1)))
            elif t == "CumSum":
                ax = int(np.asarray(get(i[1])).reshape(()).item())
                out = jnp.cumsum(jnp.asarray(get(i[0])), axis=ax)
            elif t == "Pad":
                x = jnp.asarray(get(i[0]))
                pads = [int(v) for v in np.asarray(get(i[1])).tolist()] \
                    if len(i) > 1 else list(a.get("pads"))
                half = len(pads) // 2
                cfg = list(zip(pads[:half], pads[half:]))
                mode = (a.get("mode") or b"constant")
                mode = mode.decode() if isinstance(mode, bytes) else mode
                if mode == "constant":
                    cval = 0.0
                    if len(i) > 2 and i[2]:
                        cval = np.asarray(get(i[2])).reshape(()).item()
                    out = jnp.pad(x, cfg, constant_values=cval)
                else:  # reflect / edge
                    out = jnp.pad(x, cfg,
                                  mode={"reflect": "reflect",
                                        "edge": "edge"}[mode])
            elif t == "Split":
                x = jnp.asarray(get(i[0]))
                ax = int(a.get("axis", 0))
                sizes = a.get("split")
                if sizes is None and len(i) > 1 and i[1]:
                    sizes = [int(v) for v in np.asarray(get(i[1])).tolist()]
                if sizes is None:
                    n_out = int(a.get("num_outputs", len(node.outputs)))
                    out = tuple(jnp.split(x, n_out, axis=ax))
                else:
                    idx = np.cumsum(sizes)[:-1].tolist()
                    out = tuple(jnp.split(x, idx, axis=ax))
            elif t == "ConvTranspose":
                out = self._conv_transpose(
                    get(i[0]), get(i[1]),
                    get(i[2]) if len(i) > 2 else None, a)
            elif t == "LSTM":
                out = self._lstm(get(i[0]), get(i[1]), get(i[2]),
                                 get(i[3]) if len(i) > 3 and i[3] else None,
                                 get(i[5]) if len(i) > 5 and i[5] else None,
                                 get(i[6]) if len(i) > 6 and i[6] else None,
                                 a)
            else:
                raise NotImplementedError(f"ONNX op {t} "
                                          f"(node {node.name!r})")
            if isinstance(out, tuple):
                for name, val in zip(node.outputs, out):
                    if name:
                        env[name] = val
            else:
                env[node.outputs[0]] = out
        return tuple(env[o] for o in self.g.outputs) \
            if len(self.g.outputs) > 1 else env[self.g.outputs[0]]

    @staticmethod
    def _conv(x, w, b, a):
        """NCHW Conv via lax.conv_general_dilated (maps onto the MXU)."""
        import jax.numpy as jnp
        from jax import lax

        x = jnp.asarray(x)
        w = jnp.asarray(w)
        spatial = w.ndim - 2
        strides = a.get("strides", [1] * spatial)
        dil = a.get("dilations", [1] * spatial)
        pads = a.get("pads", [0] * (2 * spatial))
        padding = [(int(pads[k]), int(pads[k + spatial]))
                   for k in range(spatial)]
        groups = int(a.get("group", 1))
        dn = lax.conv_dimension_numbers(
            x.shape, w.shape,
            ("NCHW", "OIHW", "NCHW") if spatial == 2 else
            ("NCW", "OIW", "NCW"))
        out = lax.conv_general_dilated(
            x, w, window_strides=[int(s) for s in strides],
            padding=padding, rhs_dilation=[int(d) for d in dil],
            dimension_numbers=dn, feature_group_count=groups)
        if b is not None:
            out = out + jnp.asarray(b).reshape(
                (1, -1) + (1,) * spatial)
        return out

    @staticmethod
    def _conv_transpose(x, w, b, a):
        """NCW/NCHW ConvTranspose: conv with lhs dilation = stride on the
        spatially-flipped, in/out-swapped kernel (ONNX weight layout is
        [in, out/groups, *k])."""
        import jax.numpy as jnp
        from jax import lax

        x = jnp.asarray(x)
        w = jnp.asarray(w)
        spatial = w.ndim - 2
        strides = [int(s) for s in a.get("strides", [1] * spatial)]
        pads = a.get("pads", [0] * (2 * spatial))
        opad = [int(v) for v in a.get("output_padding", [0] * spatial)]
        k = w.shape[2:]
        # flip spatial, swap I/O -> a normal conv kernel
        wf = jnp.flip(w, axis=tuple(range(2, w.ndim)))
        wf = jnp.swapaxes(wf, 0, 1)
        padding = [(k[d] - 1 - int(pads[d]),
                    k[d] - 1 - int(pads[d + spatial]) + opad[d])
                   for d in range(spatial)]
        dn = lax.conv_dimension_numbers(
            x.shape, wf.shape,
            ("NCHW", "OIHW", "NCHW") if spatial == 2 else
            ("NCW", "OIW", "NCW"))
        out = lax.conv_general_dilated(
            x, wf, window_strides=[1] * spatial, padding=padding,
            lhs_dilation=strides, dimension_numbers=dn,
            feature_group_count=int(a.get("group", 1)))
        if b is not None:
            out = out + jnp.asarray(b).reshape((1, -1) + (1,) * spatial)
        return out

    @staticmethod
    def _lstm(X, W, R, B, h0, c0, a):
        """ONNX LSTM (gate order i,o,f,c): X [T, N, I], W [D, 4H, I],
        R [D, 4H, H], B [D, 8H]. Returns (Y [T, D, N, H], Y_h, Y_c)."""
        import jax
        import jax.numpy as jnp

        X = jnp.asarray(X)
        W = jnp.asarray(W)
        R = jnp.asarray(R)
        hidden = int(a.get("hidden_size", R.shape[-1]))
        direction = a.get("direction") or b"forward"
        direction = (direction.decode()
                     if isinstance(direction, bytes) else direction)
        t, n, _ = X.shape
        dirs = W.shape[0]

        def run(x_seq, w, r, bias, h, c):
            wi, wo, wf, wc = jnp.split(w, 4, axis=0)
            ri, ro, rf, rc = jnp.split(r, 4, axis=0)
            if bias is not None:
                bw = bias[: 4 * hidden]
                br = bias[4 * hidden:]
                bi, bo, bf, bc = [bw[k * hidden:(k + 1) * hidden]
                                  + br[k * hidden:(k + 1) * hidden]
                                  for k in range(4)]
            else:
                bi = bo = bf = bc = jnp.zeros((hidden,), X.dtype)
            ys = []
            for step in range(x_seq.shape[0]):
                xt = x_seq[step]
                it = jax.nn.sigmoid(xt @ wi.T + h @ ri.T + bi)
                ot = jax.nn.sigmoid(xt @ wo.T + h @ ro.T + bo)
                ft = jax.nn.sigmoid(xt @ wf.T + h @ rf.T + bf)
                ct = jnp.tanh(xt @ wc.T + h @ rc.T + bc)
                c = ft * c + it * ct
                h = ot * jnp.tanh(c)
                ys.append(h)
            return jnp.stack(ys), h, c

        outs, hs, cs = [], [], []
        for d in range(dirs):
            rev = (direction == "reverse") or (d == 1)
            x_seq = X[::-1] if rev else X
            h = (jnp.asarray(h0)[d] if h0 is not None
                 else jnp.zeros((n, hidden), X.dtype))
            c = (jnp.asarray(c0)[d] if c0 is not None
                 else jnp.zeros((n, hidden), X.dtype))
            y, h, c = run(x_seq, W[d], R[d],
                          jnp.asarray(B)[d] if B is not None else None,
                          h, c)
            if rev:
                y = y[::-1]
            outs.append(y)
            hs.append(h)
            cs.append(c)
        Y = jnp.stack(outs, axis=1)          # [T, D, N, H]
        return Y, jnp.stack(hs), jnp.stack(cs)

    @staticmethod
    def _pool(x, a, reducer="max"):
        import jax.numpy as jnp
        from jax import lax

        x = jnp.asarray(x)
        spatial = len(a["kernel_shape"])
        ks = [int(k) for k in a["kernel_shape"]]
        strides = [int(s) for s in a.get("strides", ks)]
        pads = a.get("pads", [0] * (2 * spatial))
        padding = [(0, 0), (0, 0)] + [
            (int(pads[k]), int(pads[k + spatial])) for k in range(spatial)]
        window = (1, 1) + tuple(ks)
        strides_full = (1, 1) + tuple(strides)
        if reducer == "max":
            init = -jnp.inf
            out = lax.reduce_window(x, init, lax.max, window,
                                    strides_full, padding)
        else:
            out = lax.reduce_window(x, 0.0, lax.add, window,
                                    strides_full, padding)
            if any(p != (0, 0) for p in padding) and not a.get(
                    "count_include_pad", 0):
                # ONNX default excludes padding from the divisor
                ones = jnp.ones_like(x)
                counts = lax.reduce_window(ones, 0.0, lax.add, window,
                                           strides_full, padding)
                out = out / counts
            else:
                out = out / float(np.prod(ks))
        return out
