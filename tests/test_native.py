"""Native IO runtime tests: parity between the C++ extension and the pure
python/numpy fallbacks, plus the C printf CSV byte contract."""

import numpy as np
import pytest

native = pytest.importorskip("vampomi_tpu._native")


def test_read_into_roundtrip(tmp_path):
    data = np.arange(100000, dtype="<f8")
    path = str(tmp_path / "a.bin")
    data.tofile(path)
    out = np.empty(1000, dtype="<f8")
    n = native.read_into(path, memoryview(out), 500 * 8)
    assert n == 8000
    np.testing.assert_array_equal(out, data[500:1500])


def test_read_f64_as_f32(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=300000)
    path = str(tmp_path / "b.bin")
    data.astype("<f8").tofile(path)
    out = np.empty(200000, dtype=np.float32)
    native.read_f64_as_f32(path, memoryview(out), 100000 * 8)
    np.testing.assert_array_equal(out, data[100000:].astype(np.float32))


def test_write_from_slabs(tmp_path):
    path = str(tmp_path / "c.bin")
    a = np.arange(5.0)
    b = np.arange(5.0, 10.0)
    native.write_from(path, memoryview(b.astype("<f8")).cast("B"), 5 * 8)
    native.write_from(path, memoryview(a.astype("<f8")).cast("B"), 0)
    np.testing.assert_array_equal(np.fromfile(path), np.arange(10.0))


def test_format_csv_row_matches_python_percent():
    vals = [1.5, -0.25, 3.141592653589793, 1e-11, 123456.789]
    row = native.format_csv_row(7, vals)
    py = ("%5d" % 7 + "".join(", %20.15f" % v for v in vals) + "\n").encode()
    assert row == py


def test_write_csv_row_positional(tmp_path):
    path = str(tmp_path / "d.csv")
    open(path, "wb").write(b"iteration, v\n")
    native.write_csv_row(path, 3, [2.5])
    raw = open(path, "rb").read()
    row = b"    3,    2.500000000000000\n"
    assert raw[3 * len(row) : 4 * len(row)] == row


def test_read_missing_file_raises():
    out = np.empty(10, dtype="<f8")
    with pytest.raises(OSError):
        native.read_into("/nonexistent/nope.bin", memoryview(out), 0)


def test_read_past_eof_raises(tmp_path):
    path = str(tmp_path / "e.bin")
    np.arange(10.0).tofile(path)
    out = np.empty(20, dtype="<f8")
    with pytest.raises(OSError):
        native.read_into(path, memoryview(out), 0)


def test_bin_io_uses_native(tmp_path):
    """The io layer should route through the extension when present."""
    from vampomi_tpu.io import bin_io

    assert bin_io._native is not None
    data = np.arange(50.0)
    path = str(tmp_path / "f.bin")
    bin_io.write_bin_slab(path, data)
    np.testing.assert_array_equal(bin_io.read_bin_slab(path, 50), data)
    X32 = bin_io.read_meth_bin(path, 10, 5, dtype=np.float32)
    np.testing.assert_array_equal(X32, data.reshape(5, 10).astype(np.float32))


def test_fused_ingest_stats_matches_numpy(tmp_path):
    """read_f64_as_f32_stats: one threaded pass = f32 narrowing + per-marker
    f64 mean / centered sum of squares, equal to the numpy two-pass formula
    (reference compute_markers_statistics, src/data.cpp:233-283)."""
    from vampomi_tpu.io.bin_io import read_meth_bin_stats
    from vampomi_tpu.ops.operator import _host_stats, inv_sd_from_sumsq

    rng = np.random.default_rng(0)
    m, n = 37, 53  # odd sizes exercise row-aligned threading remainders
    X = rng.normal(2.0, 3.0, size=(m, n))
    path = str(tmp_path / "meth.bin")
    X.astype("<f8").tofile(path)

    out = read_meth_bin_stats(path, n, m)
    assert out is not None
    X32, mave, sumsq = out
    np.testing.assert_array_equal(X32, X.astype(np.float32))
    mave_np, msig_np = _host_stats(X, alpha_scale=1.0)
    np.testing.assert_allclose(mave, mave_np, rtol=1e-13)
    np.testing.assert_allclose(
        inv_sd_from_sumsq(sumsq, n, 1.0), msig_np, rtol=1e-12)

    # slab offset variant
    X32b, maveb, _ = read_meth_bin_stats(path, n, m - 10, start_marker=10)
    np.testing.assert_array_equal(X32b, X[10:].astype(np.float32))
    np.testing.assert_allclose(maveb, mave_np[10:], rtol=1e-13)

    # truncated file -> loud error
    with pytest.raises(ValueError, match="too small"):
        read_meth_bin_stats(path, n, m + 1)


def test_dataset_fused_and_numpy_paths_agree(tmp_path, small_fixture):
    """load_dataset via the fused native ingest (f32) must produce the same
    operator statistics as the f64 numpy route."""
    import jax.numpy as jnp

    from vampomi_tpu import dataset as ds_mod

    fx = small_fixture
    n, m = fx.X.shape
    path = str(tmp_path / "m.bin")
    fx.X.T.astype("<f8").tofile(path)
    ph = tmp_path / "p.phen"
    with open(ph, "w") as f:
        for i, v in enumerate(fx.y):
            f.write(f"F{i} I{i} {v}\n")

    ds32 = ds_mod.load_dataset(path, str(ph), n, m, "linear", None, jnp.float32)
    ds64 = ds_mod.load_dataset(path, str(ph), n, m, "linear", None, jnp.float64)
    # f32 compute stores mave/msig in the f32 vector dtype — compare at the
    # storage precision (the f64 fused-vs-numpy agreement is asserted at
    # 1e-13 in test_fused_ingest_stats_matches_numpy)
    np.testing.assert_allclose(
        np.asarray(ds32.dm.mave), np.asarray(ds64.dm.mave), rtol=2e-6, atol=2e-7)
    np.testing.assert_allclose(
        np.asarray(ds32.dm.msig), np.asarray(ds64.dm.msig), rtol=2e-6)
