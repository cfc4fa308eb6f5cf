"""Doctor diagnostics tests (vampomi_tpu/doctor.py) — host-side checks only;
the real-device probe is exercised just for its timeout behavior (it must
never hang the doctor, whatever the relay is doing)."""

from vampomi_tpu import doctor


def test_host_side_checks_pass(capsys):
    assert doctor.check_python_deps()
    assert doctor.check_compile_cache()
    assert doctor.check_math()
    doctor.check_native_ext()  # PASS or WARN, both truthy lines
    out = capsys.readouterr().out
    for name in ("python deps", "compile cache", "math kernels",
                 "native extension"):
        assert name in out
    assert "FAIL" not in out


def test_device_probe_times_out_instead_of_hanging(capsys):
    # 0.2 s is shorter than any fresh interpreter can import jax: the probe
    # must report FAIL (hang) quickly rather than blocking on a dead relay
    assert doctor.check_device(timeout_s=0.2) is False
    assert "hang" in capsys.readouterr().out
