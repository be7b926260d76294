"""ONNX contract hardening: evidence independent of the emitter/evaluator pair.

Four prongs (VERDICT round-2, next-round item 3):
  (a) byte-level golden tests — expected wire bytes hand-derived from the
      onnx.proto field numbers and the protobuf encoding spec, written as
      literals; `onnx_proto` must reproduce them exactly.
  (b) property/fuzz tests — randomized graphs round-trip through
      emit->parse, plus parse-side adversarial encodings (field order,
      unpacked repeated ints, multi-byte varint lengths, negative int64).
  (c) the independent spec checker (`onnx_check`) passes the three real
      exports and CATCHES injected convention bugs (axes-as-attribute,
      float shape operands, SSA/topology violations) WITHOUT ever calling
      `onnx_eval`.
  (d) op-semantics cross-checks against torch modules (torch is the
      independent oracle, not the Flax twin): GRU and the opset-16
      LayerNorm decomposition.
"""

import struct

import numpy as np
import pytest

from ocrs_models_tpu.export import onnx_proto as P
from ocrs_models_tpu.export.onnx_check import OnnxCheckError, check_bytes, check_model
from ocrs_models_tpu.export.onnx_graph import GraphBuilder, _torch_gru_to_onnx
from ocrs_models_tpu.export.onnx_proto import parse_model


# ------------------------- (a) byte-level goldens -------------------------


class TestWireGoldens:
    """Expected bytes derived BY HAND from protobuf encoding rules and the
    onnx.proto field numbers (TensorProto: dims=1, data_type=2, name=8,
    raw_data=9; NodeProto: input=1, output=2, name=3, op_type=4;
    AttributeProto: name=1, i=3, type=20; ValueInfoProto: name=1, type=2;
    TypeProto.tensor_type=1 {elem_type=1, shape=2}; Dimension: dim_value=1,
    dim_param=2). Literals below were not copied from the emitter."""

    def test_varint_edges(self):
        assert P._varint(0) == bytes.fromhex("00")
        assert P._varint(127) == bytes.fromhex("7f")
        assert P._varint(128) == bytes.fromhex("8001")
        assert P._varint(300) == bytes.fromhex("ac02")
        # int64 two's complement: -1 -> ten bytes, 9x 0xff then 0x01
        assert P._varint(-1) == bytes.fromhex("ffffffffffffffffff01")

    def test_tensor_proto_golden(self):
        # dims=[2] packed (0a 01 02), data_type FLOAT=1 (10 01),
        # name "w" (42 01 77), raw_data LE f32 {1.5, -2.0}
        # (4a 08 0000c03f 000000c0)
        expect = bytes.fromhex("0a010210014201774a080000c03f000000c0")
        assert P.tensor_proto("w", np.array([1.5, -2.0], np.float32)) == expect

    def test_int64_tensor_golden(self):
        # dims=[1], data_type INT64=7, name "s", raw_data (field 9, tag
        # 0x4a) = LE int64 -1
        got = P.tensor_proto("s", np.array([-1], np.int64))
        expect = (
            bytes.fromhex("0a0101")      # dims [1]
            + bytes.fromhex("1007")      # data_type 7
            + bytes.fromhex("420173")    # name "s"
            + bytes.fromhex("4a08")      # raw_data, len 8
            + struct.pack("<q", -1)
        )
        assert got == expect

    def test_node_proto_golden(self):
        # input "x" (0a 01 78), output "y" (12 01 79), name defaults to the
        # first output (1a 01 79), op_type "Relu" (22 04 52656c75)
        expect = bytes.fromhex("0a01781201791a0179220452656c75")
        assert P.node_proto("Relu", ["x"], ["y"]) == expect

    def test_int_attribute_golden(self):
        # name "axis" (0a 04 61786973), i=-1 as field 3 wire 0
        # (18 + 10-byte varint), type=INT(2) as field 20 (a0 01 02)
        expect = bytes.fromhex("0a046178697318ffffffffffffffffff01a00102")
        assert P._attribute("axis", -1) == expect

    def test_value_info_golden(self):
        # "x" with dims ["batch", 3]:
        # dim1 = dim_param "batch" (12 05 6261746368) boxed as dim entry
        # (0a 07 ...), dim2 = dim_value 3 (0a 02 08 03); shape = 12 0d ...;
        # tensor_type = 08 01 (elem FLOAT) + shape; TypeProto = 0a 11 ...
        expect = bytes.fromhex(
            "0a0178" "1213" "0a11" "0801" "120d"
            "0a07" "1205" "6261746368" "0a02" "0803"
        )
        assert P.value_info("x", ["batch", 3]) == expect

    def test_minimal_model_golden(self):
        # One-Relu model, every byte accounted for:
        # GraphProto: node=1, name=2, input=11 (tag 0x5a), output=12 (0x62)
        vi_x = bytes.fromhex("0a0178" "120a" "0a08" "0801" "1204" "0a020801")
        vi_y = bytes.fromhex("0a0179" "120a" "0a08" "0801" "1204" "0a020801")
        node = bytes.fromhex("0a01781201791a0179220452656c75")
        graph = (
            bytes([0x0A, len(node)]) + node
            + bytes.fromhex("120167")  # name "g"
            + bytes([0x5A, len(vi_x)]) + vi_x
            + bytes([0x62, len(vi_y)]) + vi_y
        )
        # ModelProto: ir_version=1 (08 08), producer_name=2,
        # producer_version=3, graph=7 (tag 0x3a), opset_import=8 (tag 0x42)
        producer = b"ocrs-models-tpu"
        opset = bytes.fromhex("0a00" "1010")  # domain "" + version 16
        expect = (
            bytes.fromhex("0808")
            + bytes([0x12, len(producer)]) + producer
            + bytes([0x1A, 3]) + b"0.2"
            + bytes([0x3A, len(graph)]) + graph
            + bytes([0x42, len(opset)]) + opset
        )
        got = P.model_proto(
            P.graph_proto(
                "g",
                nodes=[node],
                inputs=[P.value_info("x", [1])],
                outputs=[P.value_info("y", [1])],
                initializers=[],
            )
        )
        assert got == expect


# --------------------------- (b) fuzz round-trip ---------------------------


class TestFuzzRoundTrip:
    def test_long_names_multibyte_lengths(self):
        # >127-byte strings force 2-byte varint lengths everywhere.
        long_name = "n" * 300
        node = P.node_proto("Relu", [long_name], ["y" * 200], name="k" * 150)
        parsed = P._parse_node(node)
        assert parsed.inputs == [long_name]
        assert parsed.outputs == ["y" * 200]
        assert parsed.name == "k" * 150
        assert parsed.op_type == "Relu"

    @pytest.mark.parametrize("seed", range(5))
    def test_random_graph_round_trip(self, seed):
        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(1, 8))
        nodes, names = [], ["in0"]
        for i in range(n_nodes):
            src = names[int(rng.integers(0, len(names)))]
            out = f"v{i}_ü"  # unicode names
            attrs = {}
            kind = int(rng.integers(0, 5))
            if kind == 0:
                attrs["axis"] = int(rng.integers(-4, 4))
            elif kind == 1:
                attrs["perm"] = [int(v) for v in rng.permutation(4)]
            elif kind == 2:
                attrs["alpha"] = float(rng.normal())
            elif kind == 3:
                attrs["mode"] = "constant" * int(rng.integers(1, 30))
            else:
                attrs["value"] = rng.normal(size=(3, 2)).astype(np.float32)
            nodes.append(P.node_proto("Custom", [src], [out], **attrs))
            names.append(out)
        init = rng.normal(size=(int(rng.integers(1, 5)),)).astype(np.float32)
        graph = P.graph_proto(
            "fuzz",
            nodes=nodes,
            inputs=[P.value_info("in0", ["batch", 3])],
            outputs=[P.value_info(names[-1], [int(rng.integers(1, 9))])],
            initializers=[P.tensor_proto("w0", init)],
        )
        m = parse_model(P.model_proto(graph, opset=16))
        assert m.opset == 16 and m.ir_version == 8
        assert len(m.graph.nodes) == n_nodes
        np.testing.assert_array_equal(m.graph.initializers["w0"], init)
        for i, node in enumerate(m.graph.nodes):
            for k, v in node.attrs.items():
                if isinstance(v, np.ndarray):
                    assert v.shape == (3, 2)
                elif isinstance(v, float):
                    assert np.isfinite(v)

    def test_negative_int64_ints_attr(self):
        node = P._parse_node(
            P.node_proto("Slice", ["x"], ["y"], starts=[-9223372036854775808],
                         ends=[-1], axes=[3])
        )
        assert node.attrs["starts"] == [-9223372036854775808]
        assert node.attrs["ends"] == [-1]

    def test_parser_accepts_unpacked_repeated_ints(self):
        # Spec: parsers must accept packed AND unpacked encodings of
        # repeated scalars. Encode TensorProto.dims (field 1) UNPACKED.
        raw = np.arange(6, dtype=np.float32).tobytes()
        buf = (
            P._tag(1, 0) + P._varint(2)      # dims: 2 (unpacked entry)
            + P._tag(1, 0) + P._varint(3)    # dims: 3 (unpacked entry)
            + P._int_field(2, P.FLOAT)
            + P._str_field(8, "t")
            + P._len_field(9, raw)
        )
        t = P._parse_tensor(buf)
        assert t.array.shape == (2, 3)

    def test_parser_accepts_reordered_attr_fields(self):
        # type field (20) BEFORE name (1) — legal protobuf, unusual order.
        buf = (
            P._int_field(20, 2)              # type = INT
            + P._varint((3 << 3) | 0) + P._varint(5)  # i = 5
            + P._str_field(1, "axis")
        )
        name, val = P._parse_attr(buf)
        assert (name, val) == ("axis", 5)


# ------------------------ (c) independent checker -------------------------


def _mini_graph(nodes, inputs, outputs, inits=()):
    return P.model_proto(
        P.graph_proto("g", nodes=list(nodes), inputs=list(inputs),
                      outputs=list(outputs), initializers=list(inits))
    )


class TestChecker:
    def test_real_exports_pass(self):
        import jax
        import jax.numpy as jnp

        from ocrs_models_tpu.export import (
            build_detection_onnx,
            build_recognition_onnx,
        )
        from ocrs_models_tpu.export.torch_export import (
            export_detection_state_dict,
            export_recognition_state_dict,
        )
        from ocrs_models_tpu.models import DetectionModel, RecognitionModel

        rec = RecognitionModel(n_classes=97)
        rv = rec.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        rec_sd = export_recognition_state_dict(
            {k: jax.tree.map(np.asarray, v) for k, v in rv.items()}
        )
        check_bytes(build_recognition_onnx(rec_sd))

        det = DetectionModel()
        dv = det.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)))
        det_sd = export_detection_state_dict(
            {k: jax.tree.map(np.asarray, v) for k, v in dv.items()}
        )
        check_bytes(build_detection_onnx(det_sd))

    def test_layout_export_passes(self):
        import jax
        import jax.numpy as jnp

        from ocrs_models_tpu.export import build_layout_onnx
        from ocrs_models_tpu.export.torch_export import export_layout_state_dict
        from ocrs_models_tpu.models import LayoutModel

        model = LayoutModel()
        variables = model.init(jax.random.key(2), jnp.zeros((1, 8, 4)))
        sd = export_layout_state_dict(
            {k: jax.tree.map(np.asarray, v) for k, v in variables.items()}
        )
        check_bytes(build_layout_onnx(sd))

    def test_catches_unsqueeze_axes_attribute(self):
        # Pre-opset-13 style (axes attribute) must be rejected at opset 16.
        m = _mini_graph(
            [P.node_proto("Unsqueeze", ["x"], ["y"], axes=[0])],
            [P.value_info("x", [3])],
            [P.value_info("y", [1, 3])],
        )
        with pytest.raises(OnnxCheckError, match="not allowed|inputs"):
            check_bytes(m)

    def test_catches_slice_starts_attribute(self):
        m = _mini_graph(
            [P.node_proto("Slice", ["x"], ["y"], starts=[0], ends=[2])],
            [P.value_info("x", [3])],
            [P.value_info("y", [2])],
        )
        with pytest.raises(OnnxCheckError):
            check_bytes(m)

    def test_catches_float_reshape_shape(self):
        shape_f32 = P.tensor_proto("shape", np.array([2.0, 3.0], np.float32))
        m = _mini_graph(
            [P.node_proto("Reshape", ["x", "shape"], ["y"])],
            [P.value_info("x", [6])],
            [P.value_info("y", [2, 3])],
            inits=[shape_f32],
        )
        with pytest.raises(OnnxCheckError, match="int64"):
            check_bytes(m)

    def test_catches_missing_kernel_shape(self):
        m = _mini_graph(
            [P.node_proto("MaxPool", ["x"], ["y"], strides=[2, 2])],
            [P.value_info("x", [1, 1, 4, 4])],
            [P.value_info("y", [1, 1, 2, 2])],
        )
        with pytest.raises(OnnxCheckError, match="kernel_shape"):
            check_bytes(m)

    def test_catches_topology_violation(self):
        # b consumes a before a is produced.
        m = _mini_graph(
            [
                P.node_proto("Relu", ["a"], ["b"]),
                P.node_proto("Relu", ["x"], ["a"]),
            ],
            [P.value_info("x", [3])],
            [P.value_info("b", [3])],
        )
        with pytest.raises(OnnxCheckError, match="topological|not defined"):
            check_bytes(m)

    def test_catches_ssa_violation(self):
        m = _mini_graph(
            [
                P.node_proto("Relu", ["x"], ["y"]),
                P.node_proto("Sigmoid", ["x"], ["y"]),
            ],
            [P.value_info("x", [3])],
            [P.value_info("y", [3])],
        )
        with pytest.raises(OnnxCheckError, match="SSA"):
            check_bytes(m)

    def test_catches_missing_graph_output(self):
        m = _mini_graph(
            [P.node_proto("Relu", ["x"], ["y"])],
            [P.value_info("x", [3])],
            [P.value_info("z", [3])],
        )
        with pytest.raises(OnnxCheckError, match="never produced"):
            check_bytes(m)

    def test_catches_gru_missing_hidden_size(self):
        m = _mini_graph(
            [
                P.node_proto(
                    "GRU", ["x", "w", "r"], ["y"], direction="bidirectional"
                )
            ],
            [P.value_info("x", [5, 1, 8]), P.value_info("w", [2, 48, 8]),
             P.value_info("r", [2, 48, 16])],
            [P.value_info("y", [5, 2, 1, 16])],
        )
        with pytest.raises(OnnxCheckError, match="hidden_size"):
            check_bytes(m)

    def test_catches_unknown_attribute(self):
        m = _mini_graph(
            [P.node_proto("Conv", ["x", "w"], ["y"], kernel_shape=[3, 3],
                          output_padding=[1, 1])],
            [P.value_info("x", [1, 1, 4, 4]), P.value_info("w", [1, 1, 3, 3])],
            [P.value_info("y", [1, 1, 4, 4])],
        )
        with pytest.raises(OnnxCheckError, match="output_padding"):
            check_bytes(m)

    def test_checker_is_pure_static(self):
        """The injected-bug prong never touches onnx_eval (regression guard
        on the test design itself)."""
        import inspect

        import ocrs_models_tpu.export.onnx_check as chk

        src = inspect.getsource(chk)
        assert "onnx_eval" not in src


# --------------------- (d) torch-oracle op semantics ----------------------


class TestTorchOracle:
    def test_gru_matches_torch(self):
        torch = pytest.importorskip("torch")
        t_steps, n, input_size, hidden = 7, 3, 8, 16
        torch.manual_seed(0)
        gru = torch.nn.GRU(input_size, hidden, num_layers=1, bidirectional=True)
        sd = {f"gru.{k}": v.detach().numpy() for k, v in gru.state_dict().items()}
        w, r, b = _torch_gru_to_onnx(sd, 0, hidden)

        x = np.random.default_rng(0).normal(size=(t_steps, n, input_size))
        x = x.astype(np.float32)
        with torch.no_grad():
            y_torch, _ = gru(torch.from_numpy(x))  # [T, N, 2H]

        from ocrs_models_tpu.export.onnx_eval import _gru

        y = _gru(x, w, r, b, "bidirectional")  # [T, D, N, H]
        y_flat = np.concatenate([y[:, 0], y[:, 1]], axis=-1)
        np.testing.assert_allclose(
            y_flat, y_torch.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_layer_norm_decomposition_matches_torch(self):
        torch = pytest.importorskip("torch")
        from ocrs_models_tpu.export.onnx_eval import run_graph
        from ocrs_models_tpu.export.onnx_graph import _emit_layer_norm

        d = 12
        torch.manual_seed(1)
        ln = torch.nn.LayerNorm(d)
        with torch.no_grad():
            ln.weight += torch.randn(d) * 0.3
            ln.bias += torch.randn(d) * 0.3
        sd = {f"ln.{k}": v.detach().numpy() for k, v in ln.state_dict().items()}

        g = GraphBuilder("ln_test")
        out = _emit_layer_norm(g, sd, "ln", "x")
        g.nodes.append(P.node_proto("Identity", [out], ["y"]))
        m = parse_model(
            g.build(
                inputs=[("x", [2, 5, d])], outputs=[("y", [2, 5, d])]
            )
        )
        check_model(m)  # the decomposition must itself be spec-clean
        x = np.random.default_rng(3).normal(size=(2, 5, d)).astype(np.float32)
        y = run_graph(m, {"x": x})["y"]
        with torch.no_grad():
            y_torch = ln(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(y, y_torch, rtol=1e-4, atol=1e-5)

    def test_batchnorm_matches_torch(self):
        torch = pytest.importorskip("torch")
        from ocrs_models_tpu.export.onnx_eval import run_graph

        c = 6
        torch.manual_seed(2)
        bn = torch.nn.BatchNorm2d(c).eval()
        with torch.no_grad():
            bn.weight += torch.randn(c) * 0.3
            bn.bias += torch.randn(c) * 0.3
            bn.running_mean += torch.randn(c) * 0.5
            bn.running_var += torch.rand(c)
        node = P.node_proto(
            "BatchNormalization",
            ["x", "scale", "bias", "mean", "var"],
            ["y"],
            epsilon=1e-5,
        )
        inits = [
            P.tensor_proto("scale", bn.weight.detach().numpy()),
            P.tensor_proto("bias", bn.bias.detach().numpy()),
            P.tensor_proto("mean", bn.running_mean.numpy()),
            P.tensor_proto("var", bn.running_var.numpy()),
        ]
        m = parse_model(_mini_graph(
            [node], [P.value_info("x", [2, c, 4, 4])],
            [P.value_info("y", [2, c, 4, 4])], inits,
        ))
        check_model(m)
        x = np.random.default_rng(4).normal(size=(2, c, 4, 4)).astype(np.float32)
        y = run_graph(m, {"x": x})["y"]
        with torch.no_grad():
            y_torch = bn(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(y, y_torch, rtol=1e-4, atol=1e-5)
