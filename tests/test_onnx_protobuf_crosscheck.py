"""Independent wire-format validation of the first-party ONNX emitter.

The existing contract tests (test_onnx_export.py, test_onnx_contract.py)
execute the emitted graphs and check byte goldens, but writer AND parser
are the same first-party module — a symmetric wire-format bug would
round-trip invisibly. Here the emitted ModelProto bytes are decoded by
the google-protobuf runtime via a protoc-compiled transcription of the
public ONNX schema (tests/onnx_ir_subset.proto) — a decoder that shares
no code with ocrs_models_tpu/export/onnx_proto.py — and every semantic
field is cross-compared against the first-party parse. The reverse
direction re-serializes with protobuf (canonical encoder: packed repeated
scalars, its own field ordering) and requires the first-party parser to
read it back identically.

This is the closest offline stand-in for the downstream rten consumer of
the export contract (reference docs/training.md:138-154).
"""

import importlib.util
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocrs_models_tpu.export import (
    build_detection_onnx,
    build_layout_onnx,
    build_recognition_onnx,
)
from ocrs_models_tpu.export.onnx_proto import parse_model
from ocrs_models_tpu.export.torch_export import (
    export_detection_state_dict,
    export_layout_state_dict,
    export_recognition_state_dict,
)
from ocrs_models_tpu.models import DetectionModel, LayoutModel, RecognitionModel

_PROTO = Path(__file__).parent / "onnx_ir_subset.proto"

_ATTR_DECODERS = {
    1: lambda a: a.f,  # FLOAT
    2: lambda a: a.i,  # INT
    3: lambda a: a.s,  # STRING (bytes)
    4: lambda a: a.t,  # TENSOR
    6: lambda a: list(a.floats),
    7: lambda a: list(a.ints),
}


@pytest.fixture(scope="module")
def onnx_pb2(tmp_path_factory):
    """protoc-compile the transcribed ONNX schema and import the module."""
    protoc = shutil.which("protoc")
    if protoc is None:
        pytest.skip("protoc not available")
    pytest.importorskip("google.protobuf")
    out = tmp_path_factory.mktemp("onnx_pb2")
    res = subprocess.run(
        [protoc, f"--python_out={out}", f"-I{_PROTO.parent}", _PROTO.name],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr
    gen = out / "onnx_ir_subset_pb2.py"
    spec = importlib.util.spec_from_file_location("onnx_ir_subset_pb2", gen)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["onnx_ir_subset_pb2"] = mod
    spec.loader.exec_module(mod)
    return mod


def _models():
    """The three shipped exports, tiny-but-real weights."""
    rng = np.random.default_rng(0)

    def perturb(variables):
        return jax.tree.map(
            lambda a: jnp.asarray(
                np.abs(np.asarray(a, np.float32) + rng.normal(0, 0.1, a.shape))
                + 0.01
            ),
            variables,
        )

    out = {}
    det = DetectionModel()
    dv = perturb(det.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1))))
    out["detection"] = build_detection_onnx(
        export_detection_state_dict(
            {k: jax.tree.map(np.asarray, v) for k, v in dv.items()}
        )
    )
    rec = RecognitionModel(n_classes=97)
    rv = perturb(rec.init(jax.random.key(2), jnp.zeros((1, 64, 64, 1))))
    out["recognition"] = build_recognition_onnx(
        export_recognition_state_dict(
            {k: jax.tree.map(np.asarray, v) for k, v in rv.items()}
        )
    )
    lay = LayoutModel()
    lv = perturb(lay.init(jax.random.key(3), jnp.zeros((1, 8, 4))))
    out["layout"] = build_layout_onnx(
        export_layout_state_dict(
            {k: jax.tree.map(np.asarray, v) for k, v in lv.items()}
        )
    )
    return out


@pytest.fixture(scope="module")
def emitted():
    return _models()


def _attr_value(pb_attr):
    decode = _ATTR_DECODERS.get(pb_attr.type)
    assert decode is not None, f"unexpected attr type {pb_attr.type}"
    return decode(pb_attr)


def _norm(val):
    """Normalize attribute values for comparison across the two parsers."""
    if isinstance(val, bytes):
        return val.decode()
    if isinstance(val, str):
        return val
    if isinstance(val, (list, tuple, np.ndarray)):
        return [_norm(v) for v in val]
    if isinstance(val, float):
        return round(float(val), 6)
    return val


def _dims_from_value_info(vi):
    dims = []
    assert vi.type.WhichOneof("value") == "tensor_type"
    for d in vi.type.tensor_type.shape.dim:
        which = d.WhichOneof("value")
        dims.append(d.dim_param if which == "dim_param" else d.dim_value)
    return dims


@pytest.mark.parametrize("which", ["detection", "recognition", "layout"])
def test_protobuf_decodes_emitted_model(onnx_pb2, emitted, which):
    """google-protobuf must decode our bytes into the same semantic model
    the first-party parser sees — field by field."""
    data = emitted[which]
    pb = onnx_pb2.ModelProto()
    consumed = pb.ParseFromString(data)
    assert consumed == len(data)
    ours = parse_model(data)

    assert pb.ir_version == ours.ir_version == 8
    assert len(pb.opset_import) == 1
    assert pb.opset_import[0].version == ours.opset == 16
    assert pb.opset_import[0].domain == ""
    assert pb.producer_name == ours.producer

    g, og = pb.graph, ours.graph
    # Nodes: op types, wiring, attributes.
    assert len(g.node) == len(og.nodes)
    for pn, on in zip(g.node, og.nodes):
        assert pn.op_type == on.op_type
        assert list(pn.input) == on.inputs
        assert list(pn.output) == on.outputs
        pattrs = {a.name: _attr_value(a) for a in pn.attribute}
        assert set(pattrs) == set(on.attrs)
        for k, pv in pattrs.items():
            ov = on.attrs[k]
            if hasattr(pv, "raw_data"):  # tensor attribute
                arr = np.asarray(ov.array if hasattr(ov, "array") else ov)
                assert pv.raw_data == arr.tobytes()
                assert list(pv.dims) == list(arr.shape)
            else:
                assert _norm(pv) == _norm(ov), (pn.op_type, k)

    # Initializers: names, dims, dtype, exact raw little-endian bytes.
    pinits = {t.name: t for t in g.initializer}
    assert set(pinits) == set(og.initializers)
    for name, arr in og.initializers.items():
        arr = np.asarray(arr.array if hasattr(arr, "array") else arr)
        t = pinits[name]
        assert list(t.dims) == list(arr.shape)
        assert t.data_type == (7 if arr.dtype == np.int64 else 1)
        assert t.raw_data == arr.tobytes()

    # Graph io: names + dims including dynamic-axis dim_params.
    for pvis, ovis in ((g.input, og.inputs), (g.output, og.outputs)):
        assert [vi.name for vi in pvis] == [n for n, _ in ovis]
        for vi, (_, dims) in zip(pvis, ovis):
            assert _dims_from_value_info(vi) == list(dims)
            assert vi.type.tensor_type.elem_type == 1  # FLOAT


@pytest.mark.parametrize("which", ["detection", "recognition", "layout"])
def test_first_party_parser_reads_protobuf_encoding(onnx_pb2, emitted, which):
    """The reverse direction: protobuf's canonical re-encoding (its own
    field order, packed repeated scalars) must parse identically through
    the first-party parser — proving the parser handles encodings the
    first-party writer happens never to produce."""
    data = emitted[which]
    pb = onnx_pb2.ModelProto()
    pb.ParseFromString(data)
    reencoded = pb.SerializeToString()
    a, b = parse_model(data), parse_model(reencoded)

    assert (a.ir_version, a.opset, a.producer) == (b.ir_version, b.opset, b.producer)
    assert len(a.graph.nodes) == len(b.graph.nodes)
    for na, nb in zip(a.graph.nodes, b.graph.nodes):
        assert (na.op_type, na.inputs, na.outputs) == (nb.op_type, nb.inputs, nb.outputs)
        assert set(na.attrs) == set(nb.attrs)
        for k in na.attrs:
            va, vb = na.attrs[k], nb.attrs[k]
            if hasattr(va, "array") or isinstance(va, np.ndarray):
                aa = np.asarray(va.array if hasattr(va, "array") else va)
                ab = np.asarray(vb.array if hasattr(vb, "array") else vb)
                assert aa.dtype == ab.dtype and np.array_equal(aa, ab)
            else:
                assert _norm(va) == _norm(vb), (na.op_type, k)
    assert set(a.graph.initializers) == set(b.graph.initializers)
    for name in a.graph.initializers:
        ia, ib = a.graph.initializers[name], b.graph.initializers[name]
        aa = np.asarray(ia.array if hasattr(ia, "array") else ia)
        ab = np.asarray(ib.array if hasattr(ib, "array") else ib)
        assert aa.dtype == ab.dtype and np.array_equal(aa, ab)
    assert a.graph.inputs == b.graph.inputs
    assert a.graph.outputs == b.graph.outputs
