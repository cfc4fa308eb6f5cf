"""IO-layer tests: byte formats, parsers, positional CSV layout."""

import numpy as np
import pytest

from vampomi_tpu.io.bin_io import (
    iteration_file, parse_iteration, read_bin_slab, read_meth_bin,
    read_vec_from_text, substitute_iteration, write_bin_slab,
)
from vampomi_tpu.io.csv_writer import PositionalCSV, read_positional_csv
from vampomi_tpu.io.phen import read_covariates, read_phen


def test_phen_scales_but_does_not_center(tmp_path):
    y = np.array([2.0, 4.0, 6.0, 12.0])
    p = tmp_path / "a.phen"
    p.write_text("".join(f"{i} {i} {v}\n" for i, v in enumerate(y)))
    ph = read_phen(str(p), 4, standardize=True)
    sqn = np.sqrt((len(y) - 1) / np.sum((y - y.mean()) ** 2))
    np.testing.assert_allclose(ph.y, y * sqn)         # scaled ...
    assert abs(ph.y.mean()) > 0.1                     # ... but NOT centered
    assert ph.intercept == y.mean()
    np.testing.assert_allclose(np.std(ph.y, ddof=1), 1.0)


def test_phen_na_fatal(tmp_path):
    p = tmp_path / "b.phen"
    p.write_text("0 0 1.0\n1 1 NA\n")
    with pytest.raises(ValueError):
        read_phen(str(p), 2)


def test_phen_no_standardize(tmp_path):
    y = [1.0, 0.0, 1.0]
    p = tmp_path / "c.phen"
    p.write_text("".join(f"{i} {i} {v}\n" for i, v in enumerate(y)))
    ph = read_phen(str(p), 3, standardize=False)
    np.testing.assert_array_equal(ph.y, y)
    assert ph.scale == 1.0


def test_covariates_zscored(tmp_path):
    rng = np.random.default_rng(0)
    Z = rng.normal(3.0, 2.0, size=(10, 3))
    p = tmp_path / "c.cov"
    lines = ["ID FID c1 c2 c3"]
    for i in range(10):
        lines.append(f"id{i} f{i} " + " ".join(f"{v:.8f}" for v in Z[i]))
    p.write_text("\n".join(lines) + "\n")
    out = read_covariates(str(p), 3, 10)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-12)
    # 1/N variance denominator (reference data.cpp:218)
    np.testing.assert_allclose((out**2).mean(axis=0), 1, atol=1e-7)


def test_covariate_count_mismatch_fatal(tmp_path):
    p = tmp_path / "c.cov"
    p.write_text("hdr\nid f 1.0 2.0\n")
    with pytest.raises(ValueError):
        read_covariates(str(p), 3, 1)


def test_bin_slab_roundtrip(tmp_path):
    path = str(tmp_path / "v.bin")
    full = np.arange(10.0)
    # two disjoint slab writes into one shared file (the MPI-IO pattern)
    write_bin_slab(path, full[:6], start=0)
    write_bin_slab(path, full[6:], start=6)
    np.testing.assert_array_equal(read_bin_slab(path, 10), full)
    np.testing.assert_array_equal(read_bin_slab(path, 3, start=4), full[4:7])


def test_meth_bin_layout(tmp_path):
    X = np.arange(12.0).reshape(3, 4)  # 3 markers, 4 samples
    path = str(tmp_path / "m.bin")
    X.astype("<f8").tofile(path)
    np.testing.assert_array_equal(read_meth_bin(path, 4, 3), X)
    np.testing.assert_array_equal(read_meth_bin(path, 4, 2, start_marker=1), X[1:])


def test_text_vec_window(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("\n".join(str(float(i)) for i in range(10)))
    np.testing.assert_array_equal(read_vec_from_text(str(p), 3, start=2), [2.0, 3.0, 4.0])


def test_iteration_filename_contract(tmp_path):
    assert iteration_file("/d", "out", 7) == "/d/out_it_7.bin"
    assert iteration_file("/d", "out", 7, kind="r1_") == "/d/out_r1_it_7.bin"
    assert substitute_iteration("/d/out_it_3.bin", 9) == "/d/out_it_9.bin"
    assert parse_iteration("/d/out_it_12.bin") == "12"
    assert parse_iteration("/d/out_r1_it_5.bin") == "5"


def test_positional_csv_bytes(tmp_path):
    """Byte-layout contract: header at 0, row k at offset k*len(row), NUL
    gaps in between (reference utilities.cpp:366-401)."""
    path = str(tmp_path / "x.csv")
    c = PositionalCSV(path, ["iteration", "a", "b"])
    c.write_row(2, [1.5, -0.25])

    raw = open(path, "rb").read()
    header = b"iteration, a, b\n"
    assert raw.startswith(header)
    row = b"    2,    1.500000000000000,   -0.250000000000000\n"
    offset = 2 * len(row)
    assert raw[offset : offset + len(row)] == row
    # gap between header and row 2 is NUL
    assert raw[len(header) : offset] == b"\x00" * (offset - len(header))

    # reader strips NULs
    rows = read_positional_csv(path)
    assert rows == [[2.0, 1.5, -0.25]]


def test_positional_csv_recreate_deletes(tmp_path):
    path = str(tmp_path / "y.csv")
    c = PositionalCSV(path, ["iteration", "v"])
    c.write_row(1, [9.0])
    c2 = PositionalCSV(path, ["iteration", "v"])  # fresh run: file recreated
    raw = open(path, "rb").read()
    assert raw == b"iteration, v\n"


def test_local_slab_and_marker_file(tmp_path):
    import jax
    import jax.numpy as jnp

    from vampomi_tpu.io.bin_io import write_marker_file, read_bin_slab
    from vampomi_tpu.sharding import local_slab, make_mesh, distribute, MARKER_AXIS
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    x = np.arange(64, dtype=np.float64)
    arr = distribute(x, mesh, P(MARKER_AXIS))
    start, block = local_slab(arr)
    assert start == 0
    np.testing.assert_array_equal(block, x)

    # full-path write (single process) matches scale+truncate semantics
    path = str(tmp_path / "m.bin")
    write_marker_file(path, jnp.asarray(x), mt=50, divisor=2.0)
    got = read_bin_slab(path, 50)
    np.testing.assert_allclose(got, x[:50] * 0.5)


def test_write_bin_slab_concurrent_no_truncation(tmp_path, monkeypatch):
    """Disjoint slab writes to a fresh shared file must never truncate each
    other, even on the pure-python fallback (multi-host artifact contract)."""
    import vampomi_tpu.io.bin_io as bio

    monkeypatch.setattr(bio, "_native", None)
    path = str(tmp_path / "shared.bin")
    bio.write_bin_slab(path, np.arange(4, dtype=np.float64), start=0)
    bio.write_bin_slab(path, np.arange(4, 8, dtype=np.float64), start=4)
    got = np.fromfile(path)
    np.testing.assert_array_equal(got, np.arange(8, dtype=np.float64))


def test_truncated_bin_slab_fatal(tmp_path, monkeypatch):
    """A truncated/wrong vector file must raise loudly on BOTH the native and
    pure-python read paths (reference asserts byte counts,
    src/utilities.cpp:373-381) — a silently short estimate/r1/true-signal
    vector is silently wrong science."""
    import vampomi_tpu.io.bin_io as bio

    path = str(tmp_path / "short.bin")
    np.arange(5, dtype=np.float64).tofile(path)

    if bio._native is not None:
        with pytest.raises(Exception, match="EOF|expected"):
            bio.read_bin_slab(path, 10)
        with pytest.raises(Exception, match="EOF|expected"):
            bio.read_bin_slab(path, 3, start=4)

    monkeypatch.setattr(bio, "_native", None)
    with pytest.raises(ValueError, match="expected 10"):
        bio.read_bin_slab(path, 10)
    with pytest.raises(ValueError, match="expected 3"):
        bio.read_bin_slab(path, 3, start=4)
    # exact-length read still fine
    np.testing.assert_array_equal(bio.read_bin_slab(path, 5), np.arange(5.0))


def test_truncated_meth_bin_fatal(tmp_path):
    """meth file smaller than Mt*N*8 -> clear error at load (both paths share
    the up-front size check)."""
    path = str(tmp_path / "meth.bin")
    np.arange(3 * 4, dtype=np.float64).tofile(path)  # 3 markers x N=4
    with pytest.raises(ValueError, match="too small"):
        read_meth_bin(path, n=4, m=4)
    with pytest.raises(ValueError, match="too small"):
        read_meth_bin(path, n=4, m=2, start_marker=2)
    out = read_meth_bin(path, n=4, m=3)
    assert out.shape == (3, 4)


def test_truncated_text_vec_fatal(tmp_path):
    path = str(tmp_path / "vec.txt")
    with open(path, "w") as f:
        f.write("1.0 2.0 3.0\n")
    with pytest.raises(ValueError, match="expected 5"):
        read_vec_from_text(path, 5)
    with pytest.raises(ValueError, match="expected 2"):
        read_vec_from_text(path, 2, start=2)
