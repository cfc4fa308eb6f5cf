"""Smoke tests for tools/certify_queue.py — the committed outage-recovery
queue (VERDICT round-4 ask #9).  Everything here is stdlib-subprocess
driven and jax-free: the tool must be exercisable DURING an outage."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(ROOT, "tools", "certify_queue.py")
PY = sys.executable


def _run(args, timeout=120):
    return subprocess.run([PY, TOOL] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=ROOT)


def _write_queue(tmp_path, stages):
    qp = tmp_path / "queue.json"
    qp.write_text(json.dumps(stages))
    return str(qp)


def _state(tmp_path):
    with open(tmp_path / "state.json") as f:
        return json.load(f)["stages"]


def _base_args(tmp_path, queue_path):
    return ["--state", str(tmp_path / "state.json"), "--queue", queue_path,
            "--log-dir", str(tmp_path / "logs")]


def test_drain_ok_fail_timeout_and_continue(tmp_path):
    """One passing, one failing, one hanging stage: the queue runs ALL of
    them (a failure never aborts the queue), records rc/status/artifacts,
    and exits nonzero because not everything is done."""
    art = tmp_path / "made.json"
    stages = [
        {"name": "ok",
         "cmd": [PY, "-c",
                 f"open({str(art)!r}, 'w').write('x'); print('fine')"],
         "timeout_s": 60, "artifacts": [str(art)]},
        {"name": "bad", "cmd": [PY, "-c", "import sys; sys.exit(3)"],
         "timeout_s": 60, "artifacts": [str(tmp_path / "never.json")]},
        {"name": "hang", "cmd": [PY, "-c", "import time; time.sleep(600)"],
         "timeout_s": 2, "artifacts": []},
        {"name": "after_hang",
         "cmd": [PY, "-c", "print('still ran')"],
         "timeout_s": 60, "artifacts": []},
    ]
    qp = _write_queue(tmp_path, stages)
    r = _run(_base_args(tmp_path, qp))
    assert r.returncode == 1, r.stdout + r.stderr
    st = _state(tmp_path)
    assert st["ok"]["status"] == "done" and st["ok"]["rc"] == 0
    assert st["ok"]["artifacts"][0]["present"] is True
    assert st["bad"]["status"] == "failed" and st["bad"]["rc"] == 3
    assert st["bad"]["artifacts"][0]["present"] is False
    assert st["hang"]["status"] == "timeout" and st["hang"]["wall_s"] < 30
    # the partial-artifact contract: the queue kept going after the hang
    assert st["after_hang"]["status"] == "done"
    # per-stage logs exist and captured stdout
    log = (tmp_path / "logs" / "ok.log").read_text()
    assert "fine" in log


def test_resume_skips_done_and_retries_failed(tmp_path):
    """Re-running the queue skips done stages (side-effect counted via an
    append file) and retries failed ones only under --retry-failed."""
    counter = tmp_path / "count.txt"
    flaky_marker = tmp_path / "flaky_fixed.txt"
    # flaky: fails until the marker file exists
    flaky_code = textwrap.dedent(f"""
        import os, sys
        sys.exit(0 if os.path.exists({str(flaky_marker)!r}) else 7)
    """)
    stages = [
        {"name": "count",
         "cmd": [PY, "-c", f"open({str(counter)!r}, 'a').write('.')"],
         "timeout_s": 60, "artifacts": [str(counter)]},
        {"name": "flaky", "cmd": [PY, "-c", flaky_code],
         "timeout_s": 60, "artifacts": []},
    ]
    qp = _write_queue(tmp_path, stages)
    base = _base_args(tmp_path, qp)

    r1 = _run(base)
    assert r1.returncode == 1
    assert counter.read_text() == "."
    assert _state(tmp_path)["flaky"]["status"] == "failed"

    # plain resume: done skipped, failed NOT retried
    r2 = _run(base)
    assert r2.returncode == 1
    assert counter.read_text() == "."  # did not re-run

    # now the flake is "fixed"; --retry-failed picks it up, done still skipped
    flaky_marker.write_text("ok")
    r3 = _run(base + ["--retry-failed"])
    assert r3.returncode == 0, r3.stdout + r3.stderr
    assert counter.read_text() == "."
    st = _state(tmp_path)
    assert st["flaky"]["status"] == "done"
    assert st["count"]["status"] == "done"


def test_stale_running_is_retried(tmp_path):
    """A stage left 'running' by a dead queue process is retried."""
    stages = [{"name": "s", "cmd": [PY, "-c", "print('ok')"],
               "timeout_s": 60, "artifacts": []}]
    qp = _write_queue(tmp_path, stages)
    state_path = tmp_path / "state.json"
    state_path.write_text(json.dumps(
        {"stages": {"s": {"status": "running", "started": 0}}}))
    r = _run(_base_args(tmp_path, qp))
    assert r.returncode == 0
    assert _state(tmp_path)["s"]["status"] == "done"


def test_wait_relay_gate_with_fake_probe(tmp_path):
    """The relay gate drains only after the injected probe succeeds; a
    probe that keeps failing inside --max-wait-s exits 75 with nothing
    attempted."""
    marker = tmp_path / "relay_up.txt"
    probe = json.dumps([PY, "-c",
                        "import os, sys; "
                        f"sys.exit(0 if os.path.exists({str(marker)!r}) "
                        "else 1)"])
    stages = [{"name": "s", "cmd": [PY, "-c", "print('ran')"],
               "timeout_s": 60, "artifacts": []}]
    qp = _write_queue(tmp_path, stages)
    base = _base_args(tmp_path, qp) + [
        "--wait-relay", "--probe-cmd", probe,
        "--probe-interval-s", "0.1", "--probe-timeout-s", "60"]

    # generous subprocess timeouts: under full-suite load a python -c
    # probe can take tens of seconds to start (measured flake)
    r_down = _run(base + ["--max-wait-s", "2"], timeout=300)
    assert r_down.returncode == 75, r_down.stdout + r_down.stderr
    assert "s" not in _state(tmp_path) if (tmp_path / "state.json").exists() \
        else True

    marker.write_text("up")
    r_up = _run(base + ["--max-wait-s", "120"], timeout=300)
    assert r_up.returncode == 0, r_up.stdout + r_up.stderr
    assert _state(tmp_path)["s"]["status"] == "done"


def test_status_view(tmp_path):
    stages = [{"name": "only", "cmd": [PY, "-c", "pass"],
               "timeout_s": 60, "artifacts": []}]
    qp = _write_queue(tmp_path, stages)
    _run(_base_args(tmp_path, qp))
    r = _run(["--state", str(tmp_path / "state.json"), "--status"])
    assert r.returncode == 0
    assert "only" in r.stdout and "done" in r.stdout


def test_default_queue_names_resolve():
    """Every default-queue command points at an existing script (guards
    against queue entries rotting as tools are renamed)."""
    from tools.certify_queue import default_queue  # noqa: F401
    for stage in default_queue():
        script = stage["cmd"][1]
        assert os.path.exists(script), f"{stage['name']}: {script} missing"


@pytest.mark.parametrize("which", ["sigterm"])
def test_interrupt_persists_state(tmp_path, which):
    """SIGTERM mid-stage marks it interrupted and exits 143; the child's
    process group is reaped."""
    import signal
    import time as _t
    stages = [{"name": "long",
               "cmd": [PY, "-c", "import time; time.sleep(600)"],
               "timeout_s": 600, "artifacts": []}]
    qp = _write_queue(tmp_path, stages)
    p = subprocess.Popen([PY, TOOL] + _base_args(tmp_path, qp),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=ROOT)
    # wait for the stage to be marked running
    for _ in range(100):
        if (tmp_path / "state.json").exists() and \
                _state(tmp_path).get("long", {}).get("status") == "running":
            break
        _t.sleep(0.1)
    p.send_signal(signal.SIGTERM)
    rc = p.wait(timeout=60)
    assert rc == 143
    assert _state(tmp_path)["long"]["status"] == "interrupted"
