"""MXNet .params import (utils/mxnet_import.py): binary roundtrip under
both dim layouts, the EFM-symbol name/layout mapping proven against an
INDEPENDENT NCHW oracle (torch implements the reference graph with the raw
MXNet-layout arrays), and the CLI -> export -> native-consumer chain."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (  # noqa: E402
    EFMNet342,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils.mxnet_import import (  # noqa: E402
    MxParamsError,
    efm_params_to_mxnet,
    infer_input_size,
    map_efm_params,
    read_mxnet_params,
    write_mxnet_params,
)

SIZE = 32
CLASSES = 7


@pytest.fixture(scope="module")
def flax_params():
    model = EFMNet342(num_classes=CLASSES)
    variables = model.init(jax.random.PRNGKey(3),
                           np.zeros((1, SIZE, SIZE, 1), np.float32))
    return model, variables["params"]


def test_params_file_roundtrip_both_layouts(flax_params, tmp_path):
    """write (u32 dims and i64 dims) -> read -> identical arrays; the
    multi-hypothesis parser finds the right layout by itself."""
    _, params = flax_params
    args = efm_params_to_mxnet(jax.tree_util.tree_map(np.asarray, params))
    for dim64 in (False, True):
        path = str(tmp_path / f"p{dim64}.params")
        write_mxnet_params(path, args, dim64=dim64)
        got, aux = read_mxnet_params(path)
        assert aux == {}
        assert sorted(got) == sorted(args)
        for k in args:
            np.testing.assert_array_equal(got[k], args[k])


def test_mapping_roundtrip_exact(flax_params, tmp_path):
    """flax -> mx arrays -> .params file -> import -> identical flax tree."""
    _, params = flax_params
    np_params = jax.tree_util.tree_map(np.asarray, params)
    path = str(tmp_path / "efm.params")
    write_mxnet_params(path, efm_params_to_mxnet(np_params))
    mx_args, _ = read_mxnet_params(path)
    back = map_efm_params(mx_args)
    assert infer_input_size(mx_args) == SIZE
    flat_a = jax.tree_util.tree_leaves_with_path(np_params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path_k, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_b[path_k]),
                                      np.asarray(leaf), err_msg=str(path_k))


def _torch_efm3(t):
    import torch

    c = t.shape[1] // 3
    a, b, d = t[:, :c], t[:, c:2 * c], t[:, 2 * c:]
    return torch.cat([torch.maximum(torch.maximum(a, b), d),
                      torch.minimum(torch.minimum(a, b), d)], dim=1)


def _torch_reference_forward(args, x_nchw):
    """The reference EFM symbol graph (efm_symbol.py:22-110) executed with
    the RAW MXNet-layout arrays in torch — an NCHW implementation with no
    shared code with the flax model or the importer."""
    import torch
    import torch.nn.functional as F

    def conv(name, t, pad):
        w = torch.from_numpy(np.ascontiguousarray(args[f"{name}_weight"]))
        b = torch.from_numpy(np.ascontiguousarray(args[f"{name}_bias"]))
        return F.conv2d(t, w, b, padding=pad)

    t = torch.from_numpy(x_nchw)
    t = conv("conv1", t, 2)
    t = _torch_efm3(t)
    t = F.max_pool2d(t, 2)
    ladder = [(99, 198, 1), (198, 387, 2), (387, 261, 3), (261, 261, 4)]
    for si, (num_r, num, tar) in enumerate(ladder, start=2):
        L = str(si)
        for i in range(tar):
            blk = L if i == 0 else f"{L}{i}"
            h = _torch_efm3(t)
            h = conv(f"conv{blk}_res", h, 1)
            h = _torch_efm3(h)
            h = conv(f"conv{blk}_res_r", h, 1)
            t = t + h
        t = conv(f"conv{L}_r", t, 0)
        t = _torch_efm3(t)
        t = conv(f"conv{L}", t, 1)
        t = _torch_efm3(t)
        t = F.max_pool2d(t, 2)
    flat = t.flatten(1)  # NCHW flatten — the MXNet Flatten order
    fc1 = flat @ torch.from_numpy(args["fc1_weight"]).T + \
        torch.from_numpy(args["fc1_bias"])
    feat = _torch_efm3(fc1[:, :, None, None])[:, :, 0, 0]
    logits = feat @ torch.from_numpy(args["fc2_weight"]).T + \
        torch.from_numpy(args["fc2_bias"])
    return logits.numpy(), feat.numpy()


def test_mapping_matches_independent_nchw_oracle(flax_params):
    """The layout conversion is CORRECT, not merely self-consistent: torch
    runs the reference NCHW graph on the MXNet-layout arrays, flax runs the
    NHWC model on the mapped tree — same logits, same 342-d features."""
    torch = pytest.importorskip("torch")  # noqa: F841

    model, params = flax_params
    np_params = jax.tree_util.tree_map(np.asarray, params)
    args = efm_params_to_mxnet(np_params)

    rng = np.random.default_rng(0)
    x_nhwc = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)
    x_nchw = np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))

    logits_t, feat_t = _torch_reference_forward(args, x_nchw)
    logits_j, feat_j = model.apply({"params": params}, x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-4)


def test_import_cli_to_native_consumer(flax_params, tmp_path):
    """import_params CLI: .params -> export; the imported export embeds
    identically through the flax extractor AND the native C++ forward."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        import_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )

    model, params = flax_params
    np_params = jax.tree_util.tree_map(np.asarray, params)
    path = str(tmp_path / "EFM_RES-0280.params")
    write_mxnet_params(path, efm_params_to_mxnet(np_params))
    out = str(tmp_path / "export")
    import_params.main([path, "--out-dir", out, "--verify"])

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (SIZE, SIZE)).astype(np.float32)
    _, want = model.apply({"params": params},
                          img[None, :, :, None], train=False)
    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")
    with native.NativeEmbedder(out) as emb:
        got = emb.extract(img)
    np.testing.assert_allclose(got, np.asarray(want)[0], rtol=5e-4,
                               atol=2e-4)


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "junk.params"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(MxParamsError):
        read_mxnet_params(str(p))


def test_symbol_json_validation(tmp_path):
    """--symbol cross-check: the expected EFM graph passes; a different
    architecture is rejected with a clear error."""
    import json

    from improving_face_recognition_performance_using_triplet_loss_tpu.utils.mxnet_import import (
        validate_symbol_json,
    )

    def conv(name, nf):
        return {"op": "Convolution", "name": name,
                "attrs": {"num_filter": str(nf)}}

    nodes = [conv("conv1", 99)]
    ladder = [(99, 198, 1), (198, 387, 2), (387, 261, 3), (261, 261, 4)]
    for si, (num_r, num, tar) in enumerate(ladder, start=2):
        L = str(si)
        for i in range(tar):
            blk = L if i == 0 else f"{L}{i}"
            nodes += [conv(f"conv{blk}_res", num_r),
                      conv(f"conv{blk}_res_r", num_r * 2 // 3)]
        nodes += [conv(f"conv{L}_r", num_r), conv(f"conv{L}", num)]
    good = tmp_path / "good.json"
    good.write_text(json.dumps({"nodes": nodes}))
    convs = validate_symbol_json(str(good))
    assert convs["conv1"] == 99

    bad = tmp_path / "bad.json"
    nodes[0] = conv("conv1", 96)  # wrong stem width
    bad.write_text(json.dumps({"nodes": nodes}))
    with pytest.raises(MxParamsError):
        validate_symbol_json(str(bad))


def test_params_roundtrip_random_shapes_dtypes(tmp_path):
    """Parser robustness: arbitrary shapes/dtypes roundtrip under both dim
    widths (not just the EFM inventory)."""
    rng = np.random.default_rng(5)
    args = {
        "a_weight": rng.normal(size=(3, 1, 7, 7)).astype(np.float32),
        "b_bias": rng.normal(size=(11,)).astype(np.float64),
        "c_gamma": rng.normal(size=(2, 3, 4)).astype(np.float16),
        "d_idx": rng.integers(0, 100, size=(5, 6)).astype(np.int32),
    }
    aux = {"moving_mean": rng.normal(size=(9,)).astype(np.float32)}
    for dim64 in (False, True):
        path = str(tmp_path / f"r{dim64}.params")
        write_mxnet_params(path, args, aux, dim64=dim64)
        got_args, got_aux = read_mxnet_params(path)
        for k, v in args.items():
            np.testing.assert_array_equal(got_args[k], v)
            assert got_args[k].dtype == v.dtype
        np.testing.assert_array_equal(got_aux["moving_mean"],
                                      aux["moving_mean"])


# ---------------- gluon LightCNN_29 (train_efm.py's artifact) ------------


@pytest.fixture(scope="module")
def gluon_flax():
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN29,
    )

    model = LightCNN29(num_classes=CLASSES, gluon_shared_res=True)
    variables = model.init(jax.random.PRNGKey(4),
                           np.zeros((1, SIZE, SIZE, 1), np.float32))
    return model, variables


def _torch_gluon_forward(merged, x_nchw):
    """The gluon LightCNN_29 graph (reference lightcnn.py:17-133) in torch
    with the raw MXNet-layout arrays — shared res convs, type-1 efm blocks,
    BatchNorm feature branch, fc2 on the PRE-BN 684-d feature."""
    import torch
    import torch.nn.functional as F

    def conv(base, t, pad):
        w = torch.from_numpy(np.ascontiguousarray(merged[f"{base}.weight"]))
        b = torch.from_numpy(np.ascontiguousarray(merged[f"{base}.bias"]))
        return F.conv2d(t, w, b, padding=pad)

    t = torch.from_numpy(x_nchw)
    t = conv("conv_net.0.conv_op_2", t, 2)
    t = _torch_efm3(t)
    t = F.max_pool2d(t, 2)
    for (res_i, efm_i), n in zip(((2, 3), (5, 6), (8, 9), (11, 12)),
                                 (1, 2, 3, 4)):
        for _ in range(n):  # SHARED conv pair across iterations
            h = _torch_efm3(t)
            h = conv(f"conv_net.{res_i}.conv_op_1", h, 1)
            h = _torch_efm3(h)
            h = conv(f"conv_net.{res_i}.conv_op_2", h, 1)
            t = t + h
        t = conv(f"conv_net.{efm_i}.conv_op_1", t, 0)
        t = _torch_efm3(t)
        t = conv(f"conv_net.{efm_i}.conv_op_2", t, 1)
        t = _torch_efm3(t)
        t = F.max_pool2d(t, 2)
    flat = t.flatten(1)  # NCHW flatten
    fc1 = flat @ torch.from_numpy(merged["conv_net.15.weight"]).T + \
        torch.from_numpy(merged["conv_net.15.bias"])
    feat = _torch_efm3(fc1[:, :, None, None])[:, :, 0, 0]  # 684-d pre-BN
    eps = 1e-5
    gamma = torch.from_numpy(merged["fc1.0.gamma"])
    beta = torch.from_numpy(merged["fc1.0.beta"])
    mean = torch.from_numpy(merged["fc1.0.running_mean"])
    var = torch.from_numpy(merged["fc1.0.running_var"])
    feat_bn = gamma * (feat - mean) / torch.sqrt(var + eps) + beta
    logits = feat @ torch.from_numpy(merged["fc2.1.weight"]).T + \
        torch.from_numpy(merged["fc2.1.bias"])
    return logits.numpy(), feat_bn.numpy()


def test_gluon_mapping_matches_independent_oracle(gluon_flax, tmp_path):
    """Roundtrip the gluon save_parameters layout AND prove the mapping
    against the torch NCHW oracle (incl. shared res convs + BatchNorm)."""
    pytest.importorskip("torch")

    from improving_face_recognition_performance_using_triplet_loss_tpu.utils.mxnet_import import (
        gluon_lightcnn29_to_mxnet,
        is_gluon_lightcnn29,
        map_gluon_lightcnn29,
    )

    model, variables = gluon_flax
    np_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    # give the BN stats non-trivial values (init is mean 0 var 1)
    rng = np.random.default_rng(2)
    bstats = {"fc1_bn": {
        "mean": rng.normal(0, 0.5, 684).astype(np.float32),
        "var": rng.uniform(0.5, 2.0, 684).astype(np.float32)}}
    args, aux = gluon_lightcnn29_to_mxnet(np_params, bstats)
    path = str(tmp_path / "efm_res-0280.params")
    write_mxnet_params(path, args, aux)
    got_args, got_aux = read_mxnet_params(path)
    assert is_gluon_lightcnn29(got_args)
    back, back_stats = map_gluon_lightcnn29(got_args, got_aux)

    # mapping roundtrip is exact
    flat_a = dict(jax.tree_util.tree_leaves_with_path(np_params))
    for path_k, leaf in jax.tree_util.tree_leaves_with_path(back):
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_a[path_k]),
                                      err_msg=str(path_k))

    # independent NCHW oracle equality (mapped tree in flax vs raw arrays
    # in torch)
    merged = dict(got_args)
    merged.update(got_aux)
    x_nhwc = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)
    x_nchw = np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
    logits_t, feat_t = _torch_gluon_forward(merged, x_nchw)
    logits_j, feat_j = model.apply(
        {"params": back, "batch_stats": back_stats}, x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t, atol=3e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=3e-4)


def test_gluon_import_cli_expands_to_standard_export(gluon_flax, tmp_path):
    """import_params auto-detects the gluon layout, expands the shared res
    convs, and the export loads into the DEFAULT LightCNN29 with the same
    forward (sharing only ties gradients)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        import_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN29,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        load_exported_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.utils.mxnet_import import (
        gluon_lightcnn29_to_mxnet,
    )

    model, variables = gluon_flax
    np_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bstats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    args, aux = gluon_lightcnn29_to_mxnet(np_params, bstats)
    path = str(tmp_path / "efm_res-0042.params")
    write_mxnet_params(path, args, aux)
    out = str(tmp_path / "export")
    import_params.main([path, "--out-dir", out, "--verify"])

    params, batch_stats, manifest = load_exported_params(out)
    assert manifest["model"] == "lightcnn29"
    assert manifest["feature_dim"] == 684
    std = LightCNN29(num_classes=CLASSES)  # DEFAULT distinct-weights model
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)
    want = model.apply(variables, x, train=False)
    got = std.apply({"params": params, "batch_stats": batch_stats}, x,
                    train=False)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)


def test_reader_rejects_truncated_file(flax_params, tmp_path):
    """A valid .params cut mid-array must raise MxParamsError (the
    hypothesis loop cannot silently mis-parse a short buffer)."""
    _, params = flax_params
    args = efm_params_to_mxnet(jax.tree_util.tree_map(np.asarray, params))
    path = str(tmp_path / "full.params")
    write_mxnet_params(path, args)
    blob = open(path, "rb").read()
    for frac in (0.3, 0.7, 0.95):
        cut = tmp_path / f"cut{frac}.params"
        cut.write_bytes(blob[:int(len(blob) * frac)])
        with pytest.raises(MxParamsError):
            read_mxnet_params(str(cut))
