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
