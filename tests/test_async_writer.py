"""AsyncWriter semantics: exception surfacing, backpressure, close-on-error."""

import time

import pytest

from vampomi_tpu.utils.async_writer import AsyncWriter


def test_exceptions_surface_on_flush():
    w = AsyncWriter()
    w.submit(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        w.flush()
    w.close()


def test_exceptions_surface_on_later_submit():
    w = AsyncWriter()
    w.submit(lambda: 1 / 0)
    time.sleep(0.2)  # let the failing task finish before the next submit
    with pytest.raises(ZeroDivisionError):
        for _ in range(10):
            w.submit(lambda: None)
    w._pending.clear()
    w.close()


def test_backpressure_bounds_queue():
    w = AsyncWriter(max_pending=2)
    for _ in range(10):
        w.submit(time.sleep, 0.02)
        assert len(w._pending) <= 2
    w.close()


def test_close_reaps_thread_even_when_flush_raises():
    w = AsyncWriter()
    w.submit(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        w.close()
    assert w._ex._shutdown  # executor reaped despite the re-raise


def test_order_preserved():
    w = AsyncWriter()
    out = []
    for i in range(8):
        w.submit(out.append, i)
    w.close()
    assert out == list(range(8))


def test_csv_create_false_missing_file_raises(tmp_path):
    """Native and pure-python positional CSV writers agree: a positional
    write to a missing file with create=False is an error, not a silent
    headerless creation."""
    from vampomi_tpu.io.csv_writer import PositionalCSV

    csv = PositionalCSV(str(tmp_path / "nope" ".csv"), ["iteration", "a"], create=False)
    with pytest.raises(FileNotFoundError):
        csv.write_row(1, [1.0])
