"""dlib shape_predictor .dat codec (detect/dlib_import.py, VERDICT r2
item 8): byte-level primitive vectors, full-predictor round-trip, CLI
import-dat path, and prediction equivalence through the converted model.
"""

import io
import os

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.detect import (
    dlib_import as D,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (
    CascadeLevel,
    ShapePredictor,
)


# ------------------------------------------------------------ primitives


@pytest.mark.parametrize("value,expect", [
    (0, b"\x00"),
    (1, b"\x01\x01"),
    (255, b"\x01\xff"),
    (256, b"\x02\x00\x01"),
    (-5, b"\x81\x05"),
    (2**32, b"\x05\x00\x00\x00\x00\x01"),
])
def test_packed_int_encoding(value, expect):
    """dlib/serialize.h pack_int: control byte = n_payload | sign bit,
    then little-endian magnitude with trailing zeros trimmed."""
    buf = io.BytesIO()
    D._write_int(buf, value)
    assert buf.getvalue() == expect
    buf.seek(0)
    assert D._read_int(buf) == value


@pytest.mark.parametrize("v", [0.0, 1.0, -1.0, 0.5, 3.14159, 255.0,
                               -1e-3, 1e8, 1.0 / 3.0])
def test_float_details_roundtrip(v):
    """floats travel as float_details {mantissa, exponent}: value =
    mantissa * 2**exponent, exact for every float32."""
    buf = io.BytesIO()
    D._write_float(buf, v)
    buf.seek(0)
    assert D._read_float(buf) == float(np.float32(v))


def test_float_column_roundtrip():
    col = np.asarray([1.5, -2.25, 0.0, 100.125], np.float32)
    buf = io.BytesIO()
    D._write_fcolumn(buf, col)
    buf.seek(0)
    np.testing.assert_array_equal(D._read_fcolumn(buf), col)


# ------------------------------------------------------- full predictor


def _synthetic_predictor(rng, n_points=68, cascades=2, trees=3, depth=2):
    n_internal, n_leaves = 2**depth - 1, 2**depth
    pool = 20
    levels = []
    for _ in range(cascades):
        levels.append(CascadeLevel(
            anchors=rng.integers(0, n_points, pool).astype(np.int64),
            deltas=rng.normal(0, 0.1, (pool, 2)).astype(np.float32),
            split_idx1=rng.integers(0, pool, (trees, n_internal))
            .astype(np.int64),
            split_idx2=rng.integers(0, pool, (trees, n_internal))
            .astype(np.int64),
            split_thresh=rng.normal(0, 20, (trees, n_internal))
            .astype(np.float32),
            leaf_values=rng.normal(0, 0.01,
                                   (trees, n_leaves, 2 * n_points))
            .astype(np.float32),
        ))
    mean = rng.uniform(0.1, 0.9, (n_points, 2)).astype(np.float32)
    return ShapePredictor(mean_shape=mean, levels=levels)


def _assert_predictors_equal(a: ShapePredictor, b: ShapePredictor):
    np.testing.assert_array_equal(a.mean_shape, b.mean_shape)
    assert len(a.levels) == len(b.levels)
    for la, lb in zip(a.levels, b.levels):
        for f in ("anchors", "deltas", "split_idx1", "split_idx2",
                  "split_thresh", "leaf_values"):
            np.testing.assert_array_equal(getattr(la, f), getattr(lb, f),
                                          err_msg=f)


def test_dat_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(0)
    pred = _synthetic_predictor(rng)
    dat = str(tmp_path / "sp.dat")
    D.write_shape_predictor_dat(dat, pred)
    back = D.read_shape_predictor_dat(dat)
    _assert_predictors_equal(pred, back)


def test_imported_predictor_predicts_identically(tmp_path):
    """The converted model is not just structurally equal — it traverses to
    the same landmarks on an image."""
    rng = np.random.default_rng(1)
    pred = _synthetic_predictor(rng, cascades=3, trees=4, depth=3)
    dat = str(tmp_path / "sp.dat")
    D.write_shape_predictor_dat(dat, pred)
    back = D.read_shape_predictor_dat(dat)
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    rect = np.asarray([8, 8, 56, 56], np.float32)
    np.testing.assert_array_equal(pred.predict(img, rect),
                                  back.predict(img, rect))


def test_version_and_corruption_guards(tmp_path):
    bad = str(tmp_path / "bad.dat")
    with open(bad, "wb") as f:
        D._write_int(f, 7)  # wrong version
    with pytest.raises(ValueError, match="version"):
        D.read_shape_predictor_dat(bad)
    with open(bad, "wb") as f:
        f.write(b"\x7f")  # 127 payload bytes claimed: not a dlib int
    with pytest.raises(ValueError, match="payload"):
        D.read_shape_predictor_dat(bad)
    # short int payload at EOF must raise, not silently decode garbage
    with open(bad, "wb") as f:
        f.write(b"\x04\x01")  # 4 payload bytes claimed, 1 present
    with pytest.raises(EOFError, match="truncated"):
        D.read_shape_predictor_dat(bad)
    # an implausible count must fail BEFORE the np.empty allocation
    with open(bad, "wb") as f:
        D._write_int(f, 1)            # version
        D._write_fcolumn(f, np.zeros(4, np.float32))  # initial_shape (L=2)
        D._write_int(f, 1)            # n_cascades
        D._write_int(f, 1)            # n_trees
        D._write_int(f, 1 << 40)      # n_splits: would allocate ~TBs
    with pytest.raises(ValueError, match="implausible split count"):
        D.read_shape_predictor_dat(bad)


def test_cli_import_dat(tmp_path, capsys):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        landmarks68,
    )

    rng = np.random.default_rng(2)
    pred = _synthetic_predictor(rng)
    dat = str(tmp_path / "sp.dat")
    D.write_shape_predictor_dat(dat, pred)
    out = str(tmp_path / "sp.npz")
    native = str(tmp_path / "sp_native.npz")
    landmarks68.main(["import-dat", dat, "--out", out,
                      "--export-native", native])
    assert "imported 2 cascades x 3 trees, 68 points" in \
        capsys.readouterr().out
    _assert_predictors_equal(pred, ShapePredictor.load(out))
    assert os.path.exists(native)
    # export-dat closes the loop: npz -> dat -> identical bytes semantics
    dat2 = str(tmp_path / "sp2.dat")
    landmarks68.main(["export-dat", out, "--out", dat2])
    _assert_predictors_equal(pred, D.read_shape_predictor_dat(dat2))


def test_native_regressor_runs_imported_model(tmp_path):
    """import-dat --export-native feeds the C++ regressor: NativeErt must
    load the converted .npz and agree with the Python predictor."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_ert,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")
    rng = np.random.default_rng(3)
    pred = _synthetic_predictor(rng)
    dat = str(tmp_path / "sp.dat")
    D.write_shape_predictor_dat(dat, pred)
    back = D.read_shape_predictor_dat(dat)
    npz = export_ert(str(tmp_path / "sp_native.npz"), back)
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    rect = np.asarray([8, 8, 56, 56], np.float32)
    with native.NativeErt(npz) as ert:
        got = ert.predict(img, rect)
    np.testing.assert_allclose(got, pred.predict(img, rect),
                               rtol=1e-5, atol=1e-3)
