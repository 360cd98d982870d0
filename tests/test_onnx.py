"""ONNX frontend tests: wire-format writer/reader round-trip and the JAX
graph executor vs torch op semantics (conv-TDF-style graph)."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from aicovergen_tpu.convert.onnx_proto import read_onnx, write_onnx
from aicovergen_tpu.models.mdx import OnnxExecutor


def _build_tdf_like_graph(path, seed=0):
    """A conv-TDF-flavored graph: Conv+BN+ReLU, a freq-dim linear (TDF),
    ConvTranspose upsample, Slice, residual Add, Sigmoid mask Mul."""
    rng = np.random.default_rng(seed)
    c_in, c_mid, f_dim, t_dim = 4, 8, 32, 16

    w1 = rng.standard_normal((c_mid, c_in, 3, 3)).astype(np.float32) * 0.2
    b1 = rng.standard_normal(c_mid).astype(np.float32) * 0.1
    bn_scale = rng.uniform(0.5, 1.5, c_mid).astype(np.float32)
    bn_bias = rng.standard_normal(c_mid).astype(np.float32) * 0.1
    bn_mean = rng.standard_normal(c_mid).astype(np.float32) * 0.1
    bn_var = rng.uniform(0.5, 1.5, c_mid).astype(np.float32)
    # TDF: linear along the freq axis (operates on (..., f_dim))
    tdf_w = rng.standard_normal((f_dim, f_dim)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((c_mid, c_mid, 2, 2)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((c_in, c_mid, 1, 1)).astype(np.float32) * 0.2
    b3 = rng.standard_normal(c_in).astype(np.float32) * 0.1

    nodes = [
        ("Conv", ["input", "w1", "b1"], ["conv1"],
         {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1], "strides": [1, 1]}),
        ("BatchNormalization", ["conv1", "bn_s", "bn_b", "bn_m", "bn_v"], ["bn1"],
         {"epsilon": 1e-5}),
        ("Relu", ["bn1"], ["relu1"], {}),
        # TDF: transpose freq to last, matmul, transpose back
        ("Transpose", ["relu1"], ["tr1"], {"perm": [0, 1, 3, 2]}),
        ("MatMul", ["tr1", "tdf_w"], ["tdf"], {}),
        ("Relu", ["tdf"], ["tdf_r"], {}),
        ("Transpose", ["tdf_r"], ["tr2"], {"perm": [0, 1, 3, 2]}),
        ("Add", ["relu1", "tr2"], ["mid"], {}),
        ("AveragePool", ["mid"], ["pooled"], {"kernel_shape": [2, 2], "strides": [2, 2]}),
        ("ConvTranspose", ["pooled", "w2"], ["up"],
         {"kernel_shape": [2, 2], "strides": [2, 2]}),
        ("Slice", ["up", "sl_starts", "sl_ends", "sl_axes"], ["upc"], {}),
        ("Conv", ["upc", "w3", "b3"], ["mask_pre"],
         {"kernel_shape": [1, 1]}),
        ("Sigmoid", ["mask_pre"], ["mask"], {}),
        ("Mul", ["mask", "input"], ["output"], {}),
    ]
    inits = {
        "w1": w1, "b1": b1, "bn_s": bn_scale, "bn_b": bn_bias, "bn_m": bn_mean,
        "bn_v": bn_var, "tdf_w": tdf_w, "w2": w2, "w3": w3, "b3": b3,
        "sl_starts": np.array([0, 0], np.int64),
        "sl_ends": np.array([f_dim, t_dim], np.int64),
        "sl_axes": np.array([2, 3], np.int64),
    }
    write_onnx(path, nodes, inits, {"input": [None, c_in, f_dim, t_dim]}, ["output"])

    def torch_forward(x):
        x = torch.from_numpy(x)
        h = F.conv2d(x, torch.from_numpy(w1), torch.from_numpy(b1), padding=1)
        h = F.batch_norm(
            h, torch.from_numpy(bn_mean), torch.from_numpy(bn_var),
            torch.from_numpy(bn_scale), torch.from_numpy(bn_bias), eps=1e-5,
        )
        h = torch.relu(h)
        tdf = torch.relu(h.transpose(2, 3) @ torch.from_numpy(tdf_w)).transpose(2, 3)
        mid = h + tdf
        pooled = F.avg_pool2d(mid, 2)
        up = F.conv_transpose2d(pooled, torch.from_numpy(w2), stride=2)
        up = up[:, :, :f_dim, :t_dim]
        mask = torch.sigmoid(F.conv2d(up, torch.from_numpy(w3), torch.from_numpy(b3)))
        return (mask * x).numpy()

    return torch_forward


def test_roundtrip_and_execute(tmp_path):
    path = str(tmp_path / "tdf.onnx")
    torch_forward = _build_tdf_like_graph(path)
    graph = read_onnx(path)
    assert graph.inputs == ["input"]
    assert graph.outputs == ["output"]
    assert len(graph.nodes) == 14
    assert graph.input_shapes["input"][1:] == [4, 32, 16]

    executor = OnnxExecutor(graph)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 32, 16)).astype(np.float32)
    ours = np.asarray(executor(jnp.asarray(x)))
    ref = torch_forward(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_executor_under_jit(tmp_path):
    """The executor must trace cleanly inside jax.jit (the separation hot
    path fuses STFT -> net -> iSTFT into one program)."""
    import jax

    path = str(tmp_path / "tdf2.onnx")
    torch_forward = _build_tdf_like_graph(path, seed=3)
    executor = OnnxExecutor(read_onnx(path))

    jitted = jax.jit(lambda v: executor(v))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 32, 16)).astype(np.float32)
    ours = np.asarray(jitted(jnp.asarray(x)))
    np.testing.assert_allclose(ours, torch_forward(x), rtol=1e-4, atol=1e-5)


def test_shape_subgraph_is_traced_concretely(tmp_path):
    """Shape -> Gather -> Concat -> Reshape chains must resolve at trace
    time (numpy), not become device ops."""
    path = str(tmp_path / "shapes.onnx")
    nodes = [
        ("Shape", ["input"], ["shp"], {}),
        ("Gather", ["shp", "idx0"], ["b"], {"axis": 0}),
        ("Concat", ["b", "minus1"], ["target"], {"axis": 0}),
        ("Reshape", ["input", "target"], ["flat"], {}),
        ("Relu", ["flat"], ["output"], {}),
    ]
    inits = {
        "idx0": np.array(0, np.int64),
        "minus1": np.array([-1], np.int64),
    }
    write_onnx(path, nodes, inits, {"input": [None, 3, 5]}, ["output"])
    executor = OnnxExecutor(read_onnx(path))
    import jax

    x = np.arange(30, dtype=np.float32).reshape(2, 3, 5)
    out = np.asarray(jax.jit(lambda v: executor(v))(jnp.asarray(x)))
    assert out.shape == (2, 15)
    np.testing.assert_allclose(out, np.maximum(x.reshape(2, 15), 0))


def test_conv_tdf_replica_traces_and_runs(tmp_path):
    """A faithful conv-TDF (KUIELab/UVR MDX-Net) U-Net — TFC conv blocks,
    TDF frequency-bottleneck linears, strided down/up scaling, skip concats —
    must load and execute through the OnnxExecutor.  This guards the op set
    the real UVR checkpoints (Voc_FT/KARA_2/Reverb_HQ) rely on: if the
    executor would die at models/mdx.py's unsupported-op guard on a real
    graph, it dies here first."""
    from aicovergen_tpu.models.conv_tdf import ConvTDFSpec, build_conv_tdf_onnx
    from aicovergen_tpu.models.mdx import OnnxExecutor

    path = str(tmp_path / "conv_tdf.onnx")
    spec = ConvTDFSpec(dim_f=64, dim_t=32, g=4, n_scales=3, tfc=2, bn_factor=8)
    build_conv_tdf_onnx(path, spec)
    executor = OnnxExecutor(read_onnx(path))

    import jax

    x = np.random.default_rng(0).standard_normal((2, 4, 64, 32)).astype(np.float32)
    out = np.asarray(jax.jit(lambda v: executor.apply(executor.weights, v))(jnp.asarray(x)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    # conv+BN fusion must have folded every BN directly following a conv
    # (TDF channel BatchNorms follow MatMul+Add and legitimately remain)
    produced_by = {o: n.op_type for n in executor.graph.nodes for o in n.outputs}
    for n in executor.graph.nodes:
        if n.op_type == "BatchNormalization":
            assert produced_by.get(n.inputs[0]) not in ("Conv", "ConvTranspose")
    # topology sanity: the multiplicative skips must be present
    assert any(n.op_type == "Mul" for n in executor.graph.nodes)


def test_conv_tdf_replica_through_separation(tmp_path):
    """Full separation path over the replica net at reduced dims: the fused
    STFT->conv-TDF->iSTFT chunk pipeline must produce finite stereo stems."""
    from aicovergen_tpu.models.conv_tdf import ConvTDFSpec, build_conv_tdf_onnx
    from aicovergen_tpu.models.mdx import load_mdx_model
    from aicovergen_tpu.pipeline.separate import MDXParams, separate

    path = str(tmp_path / "conv_tdf_sep.onnx")
    spec = ConvTDFSpec(dim_f=256, dim_t=32, g=4, n_scales=3, tfc=1)
    build_conv_tdf_onnx(path, spec)
    model_fn = load_mdx_model(path)

    params = MDXParams(dim_f=256, dim_t=32, n_fft=1024, compensation=1.02)
    t = np.arange(3 * 44100) / 44100
    wave = np.stack(
        [np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)]
    ).astype(np.float32) * 0.5
    primary, complement = separate(wave, model_fn, params, denoise=True, batch_size=4)
    assert primary.shape == wave.shape and complement.shape == wave.shape
    assert np.isfinite(primary).all() and np.isfinite(complement).all()


def test_separate_device_path_matches_host_path(tmp_path):
    """A jnp input runs the device-resident chunk/join/complement path;
    results must equal the host-numpy path."""
    from aicovergen_tpu.pipeline.separate import MDXParams, separate

    params = MDXParams(dim_f=128, dim_t=32, n_fft=512, hop=256, compensation=1.02)
    rng = np.random.default_rng(5)
    wave = rng.standard_normal((2, params.chunk_size * 3 + 123)).astype(np.float32) * 0.3
    model_fn = lambda spec: spec * 0.5

    p_host, c_host = separate(wave, model_fn, params, denoise=True, batch_size=4)
    p_dev, c_dev = separate(jnp.asarray(wave), model_fn, params, denoise=True, batch_size=4)
    assert not isinstance(p_host, jnp.ndarray)
    assert isinstance(p_dev, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(p_dev), p_host, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_dev), c_host, atol=1e-5)

    # streamed-upload entry (cover stage 1): host input, device stems, wave
    # reconstructed on device from the uploaded chunk bodies
    p_st, c_st = separate(
        wave, model_fn, params, denoise=True, batch_size=4, device_out=True
    )
    assert isinstance(p_st, jnp.ndarray) and isinstance(c_st, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(p_st), p_host, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_st), c_host, atol=1e-5)


def _attr_f(name, v):
    from aicovergen_tpu.convert.onnx_proto import ATTR_FLOAT, OnnxAttr

    return OnnxAttr(name=name, type=ATTR_FLOAT, f=v)


def test_bn_fold_unique_names_for_shared_conv_weights():
    """Regression: torch.onnx.export dedups equal initializers, so two convs
    can reference ONE weight name; the conv+BN fusion must key its folded
    tensors per BN node, not per weight name — a shared key let the second
    fusion overwrite the first conv's folded stats."""
    from aicovergen_tpu.convert.onnx_proto import OnnxGraph, OnnxNode

    rng = np.random.default_rng(7)
    w = rng.standard_normal((2, 2, 1, 1)).astype(np.float32)
    inits = {"w": w}
    nodes = []
    for tag, var in (("a", 0.5), ("b", 2.0)):
        nodes.append(OnnxNode("Conv", ["x" if tag == "a" else "bn_a", "w"], [f"c_{tag}"]))
        inits.update({
            f"g_{tag}": np.full(2, 1.5, np.float32),
            f"beta_{tag}": np.full(2, 0.1, np.float32),
            f"mu_{tag}": np.full(2, 0.2, np.float32),
            f"var_{tag}": np.full(2, var, np.float32),
        })
        nodes.append(OnnxNode(
            "BatchNormalization",
            [f"c_{tag}", f"g_{tag}", f"beta_{tag}", f"mu_{tag}", f"var_{tag}"],
            [f"bn_{tag}"],
            attrs={"epsilon": _attr_f("epsilon", 1e-5)},
        ))
    graph = OnnxGraph(nodes=nodes, initializers=inits, inputs=["x"], outputs=["bn_b"])

    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    plain = np.asarray(OnnxExecutor(
        OnnxGraph([OnnxNode(n.op_type, list(n.inputs), list(n.outputs), attrs=dict(n.attrs))
                   for n in nodes], dict(inits), ["x"], ["bn_b"]),
        fuse=False,
    )(jnp.asarray(x)))
    fused = np.asarray(OnnxExecutor(graph, fuse=True)(jnp.asarray(x)))
    np.testing.assert_allclose(fused, plain, rtol=1e-5, atol=1e-6)


def test_executor_strictness_and_cast_roundtrip(tmp_path):
    """Missing named tensors must raise (not run Conv with bias=None);
    auto_pad=SAME_LOWER places the odd pad sample at the beginning;
    cast(bf16) then cast(f32) restores the pristine weights."""
    from aicovergen_tpu.convert.onnx_proto import OnnxGraph, OnnxNode

    rng = np.random.default_rng(9)
    w = rng.standard_normal((1, 1, 2, 2)).astype(np.float32)
    x = rng.standard_normal((1, 1, 4, 4)).astype(np.float32)

    # SAME_LOWER with k=2 (total pad 1 per dim): extra pad at the BEGINNING
    from aicovergen_tpu.convert.onnx_proto import ATTR_STRING, OnnxAttr

    node = OnnxNode("Conv", ["x", "w"], ["y"], attrs={
        "auto_pad": OnnxAttr(name="auto_pad", type=ATTR_STRING, s=b"SAME_LOWER")
    })
    g = OnnxGraph([node], {"w": w}, ["x"], ["y"])
    out = np.asarray(OnnxExecutor(g, fuse=False)(jnp.asarray(x)))
    xp = np.pad(x, ((0, 0), (0, 0), (1, 0), (1, 0)))  # SAME_LOWER: pad begin
    ref = np.zeros((1, 1, 4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            ref[0, 0, i, j] = np.sum(xp[0, 0, i : i + 2, j : j + 2] * w[0, 0])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # missing named bias -> KeyError naming the tensor
    bad = OnnxGraph(
        [OnnxNode("Conv", ["x", "w", "ghost_bias"], ["y"])], {"w": w}, ["x"], ["y"]
    )
    with pytest.raises(KeyError, match="ghost_bias"):
        OnnxExecutor(bad, fuse=False)(jnp.asarray(x))

    # cast round-trip from pristine initializers
    ex = OnnxExecutor(g, fuse=False)
    big = rng.standard_normal((65,)).astype(np.float32)  # >64 elems -> weights
    ex.initializers["w2"] = big
    ex.weights["w2"] = big
    ex.cast(jnp.bfloat16)
    assert ex.weights["w2"].dtype != np.float32
    restored = ex.cast(jnp.float32)
    np.testing.assert_array_equal(restored["w2"], big)


def test_resize_floor_sizes_and_unsupported_modes():
    """ONNX Resize: scale-derived sizes use floor per spec; non-integer
    nearest scales and align_corners raise instead of silently diverging."""
    from aicovergen_tpu.convert.onnx_proto import ATTR_STRING, OnnxAttr, OnnxGraph, OnnxNode

    x = np.arange(8, dtype=np.float32).reshape(1, 1, 2, 4)

    def make(scales, ctm=None):
        attrs = {}
        if ctm:
            attrs["coordinate_transformation_mode"] = OnnxAttr(
                name="coordinate_transformation_mode", type=ATTR_STRING, s=ctm
            )
        node = OnnxNode("Resize", ["x", "", "scales"], ["y"], attrs=attrs)
        g = OnnxGraph([node], {"scales": np.asarray(scales, np.float32)},
                      ["x"], ["y"])
        return OnnxExecutor(g, fuse=False)

    out = np.asarray(make([1.0, 1.0, 2.0, 2.0])(jnp.asarray(x)))
    assert out.shape == (1, 1, 4, 8)
    np.testing.assert_array_equal(out[0, 0, :2, :2], [[0, 0], [0, 0]])

    with pytest.raises(NotImplementedError):
        make([1.0, 1.0, 1.5, 1.5])(jnp.asarray(x))  # non-integer nearest
    with pytest.raises(NotImplementedError):
        make([1.0, 1.0, 2.0, 2.0], ctm=b"align_corners")(jnp.asarray(x))


def test_separate_pads_short_songs_to_full_batches():
    """Regression: with fewer chunks than the batch group (short songs),
    zeros_like(stream[:pad_n]) could only supply n filler rows, so the
    dispatched batch was smaller than `group` — a second program shape
    unsharded, a NamedSharding divisibility crash sharded."""
    from aicovergen_tpu.parallel.mesh import make_chunk_sharder, make_mesh
    from aicovergen_tpu.pipeline.separate import MDXParams, separate

    params = MDXParams(dim_f=128, dim_t=32, n_fft=512, hop=256, compensation=1.02)
    rng = np.random.default_rng(11)
    # one chunk only: n=1 while denoise group = batch_size//2 = 4 (pad_n=3>n)
    wave = rng.standard_normal((2, params.chunk_size // 2)).astype(np.float32) * 0.3

    seen_rows = []

    def model_fn(spec):
        seen_rows.append(int(spec.shape[0]))
        return spec * 0.5

    primary, _ = separate(wave, model_fn, params, denoise=True, batch_size=8)
    assert primary.shape == wave.shape
    # denoise nets 2 rows (+x/-x) per chunk: every dispatched batch must be
    # the full doubled group — one program shape, no short remainder batch
    assert set(seen_rows) == {8}, seen_rows

    # sharded: 1 chunk across an 8-device data mesh must pad to 8, not crash
    mesh = make_mesh(8)
    shard = make_chunk_sharder(mesh)
    p_sh, _ = separate(wave, model_fn, params, denoise=True, batch_size=8, shard=shard)
    np.testing.assert_allclose(np.asarray(p_sh), primary, atol=1e-5)


@pytest.mark.slow
def test_real_uvr_checkpoints_trace_if_present():
    """Gated on the real UVR checkpoints being downloaded (zero-egress CI
    skips): trace each of the three production graphs through OnnxExecutor
    and run one chunk — this is the proof the executor covers the real op
    set (reference src/mdx.py:74-77 runs these as a black box)."""
    import os

    from aicovergen_tpu.io.assets import AssetStore, default_base_dir, mdx_params_for
    from aicovergen_tpu.models.mdx import load_mdx_model
    from aicovergen_tpu.pipeline.separate import separate

    store = AssetStore(default_base_dir())
    names = ["UVR-MDX-NET-Voc_FT.onnx", "UVR_MDXNET_KARA_2.onnx", "Reverb_HQ_By_FoxJoy.onnx"]
    paths = [store.mdx_model_path(n) for n in names]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("real UVR checkpoints not downloaded (aicovergen-download)")

    t = np.arange(2 * 44100) / 44100
    wave = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)]).astype(
        np.float32
    ) * 0.5
    for path in paths:
        model_fn = load_mdx_model(path)  # raises on any unsupported op
        params = mdx_params_for(path)
        primary, complement = separate(wave, model_fn, params, denoise=False, batch_size=2)
        assert np.isfinite(primary).all() and np.isfinite(complement).all()


def test_grouped_conv_transpose_matches_torch(tmp_path):
    """ONNX ConvTranspose with group>1 (weight layout (C_in, C_out/g, kH, kW))
    vs torch.  Published conv-TDF variants use grouped transposed convs in
    their upsampling path; the executor regroups the kernel into a grouped
    dilated conv."""
    rng = np.random.default_rng(3)
    cin, cout, g_ = 8, 12, 4
    w = rng.standard_normal((cin, cout // g_, 3, 3)).astype(np.float32) * 0.3
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    x = rng.standard_normal((2, cin, 9, 7)).astype(np.float32)

    for strides, pads, outp in [
        ([2, 2], [0, 0, 0, 0], [0, 0]),
        ([2, 2], [1, 1, 1, 1], [1, 1]),
        ([1, 2], [1, 0, 1, 0], [0, 1]),
    ]:
        path = str(tmp_path / "gct.onnx")
        write_onnx(
            path,
            [("ConvTranspose", ["input", "w", "b"], ["output"],
              {"kernel_shape": [3, 3], "strides": strides, "pads": pads,
               "output_padding": outp, "group": g_})],
            {"w": w, "b": b},
            {"input": [None, cin, 9, 7]},
            ["output"],
        )
        ex = OnnxExecutor(read_onnx(path), fuse=False)
        ours = np.asarray(ex(x))
        with torch.no_grad():
            ref = F.conv_transpose2d(
                torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                stride=strides, padding=(pads[0], pads[1]),
                output_padding=outp, groups=g_,
            ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_torch_exported_tfc_tdf_matches_golden():
    """The committed fixture is a REAL ``torch.onnx.export`` output (legacy
    torchscript exporter, opset 12, dynamic batch axis) of the published
    KUIELab Conv_TDF_net_trim topology — BatchNorm TFC blocks, residual
    frequency-bottleneck linears, multiplicative decoder skips (see
    scripts/make_mdx_torch_export.py).  The executor must trace the
    exporter's actual node stream and match torch's eval forward."""
    import os

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    onnx_path = os.path.join(fixdir, "mdx_torch_export.onnx")
    fx = np.load(os.path.join(fixdir, "mdx_torch_export.npz"))
    ex = OnnxExecutor(read_onnx(onnx_path))

    import jax

    out = np.asarray(
        jax.jit(lambda v: ex.apply(ex.weights, v))(jnp.asarray(fx["x"]))
    )
    ref = fx["ref"]
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-12)
    assert err < 5e-4, err
    # the multiplicative-skip export carries Mul nodes; conv+BN fusion must
    # have folded every BN that directly follows a Conv/ConvTranspose (the
    # TDF BatchNorms follow MatMul+Add and legitimately remain)
    assert any(n.op_type == "Mul" for n in ex.graph.nodes)
    produced_by = {
        o: n.op_type for n in ex.graph.nodes for o in n.outputs
    }
    for n in ex.graph.nodes:
        if n.op_type == "BatchNormalization":
            assert produced_by.get(n.inputs[0]) not in ("Conv", "ConvTranspose"), (
                n.name, produced_by.get(n.inputs[0])
            )


def test_separate_denoise_matches_plain_for_linear_model():
    """denoise = 0.5*(f(x) - f(-x)) (reference src/mdx.py:261-263); for a
    LINEAR model this equals f(x), so the spectral-domain denoise program
    (shared STFT, combine-before-iSTFT) must reproduce the plain path."""
    from aicovergen_tpu.pipeline.separate import MDXParams, separate

    params = MDXParams(dim_f=128, dim_t=32, n_fft=512, hop=256, compensation=1.0)
    rng = np.random.default_rng(11)
    wave = rng.standard_normal((2, params.chunk_size * 2 + 777)).astype(np.float32) * 0.3
    model_fn = lambda spec: spec * 0.37

    p_plain, _ = separate(wave, model_fn, params, denoise=False, batch_size=4)
    p_dn, _ = separate(wave, model_fn, params, denoise=True, batch_size=4)
    np.testing.assert_allclose(p_dn, p_plain, atol=2e-5)
