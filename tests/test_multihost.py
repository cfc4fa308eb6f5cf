"""True multi-process multi-host validation: two JAX processes (4 virtual
CPU devices each) run the full linear engine over a shared 8-device marker
mesh — distributed init, per-process slab reads of the shared .bin, sharded
compute with psum, and per-host slab writes of the artifact files — and the
result matches a single-process run to fp-reduction-order tolerance (the
same rank-count-invariance contract the reference relies on, SURVEY §4.5)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                               "--xla_cpu_max_isa=AVX2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port, work = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    sys.path.insert(0, "__REPO__")
    import numpy as np
    import jax.numpy as jnp
    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.dataset import load_dataset
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.sharding import make_mesh

    mesh = make_mesh()
    assert jax.process_count() == 2 and len(jax.devices()) == 8
    ds = load_dataset(work + "/ex.bin", work + "/ex.phen", 120, 160,
                      "linear", mesh, jnp.float64)
    cfg = RunConfig(out_dir=work, out_name="mh", iterations=3, h2=0.8,
                    probs=[0.9, 0.07, 0.03], vars=[0.0, 1e-3, 1e-2],
                    stop_criteria_thr=0.0, seed=7, trace=0)
    ts = np.fromfile(work + "/ex_ts.bin")
    res = infere_linear(ds.dm, ds.phen.y, cfg, true_signal=ts,
                        write_outputs=True)
    print("GAMW", repr(res.gamw))
    # quantized load: every process must see the GLOBAL dequantization
    # scale (allgathered), not just its slab's
    ds8 = load_dataset(work + "/ex.bin", work + "/ex.phen", 120, 160,
                       "linear", mesh, jnp.int8)
    assert ds8.qscale is not None and ds8.qscale.shape == (160,)
    print("QSCALESUM", repr(float(np.sum(ds8.qscale))))
    # eigen cache under multi-process: only the writer process (0) saves;
    # after the barrier every process reloads the same factor
    from jax.experimental import multihost_utils
    from vampomi_tpu.ops.eigen import build_eigen_cached
    from vampomi_tpu.ops.spectral import build_spectral
    fac = build_spectral(ds.dm)
    ef, dg = build_eigen_cached(fac, work + "/eig.npz")
    assert not dg.get("loaded")
    multihost_utils.sync_global_devices("eigen_cache_saved")
    ef2, dg2 = build_eigen_cached(fac, work + "/eig.npz")
    assert dg2.get("loaded"), "all processes must reload after the barrier"
    from vampomi_tpu.sharding import fetch_global
    print("LAMSUM", repr(float(np.sum(fetch_global(ef2.lam)))))
""").replace("__REPO__", REPO)


WORKER4 = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    # AVX2 cap: match conftest.py so the shared persistent compile cache
    # round-trips between the suite process and the workers
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                               "--xla_cpu_max_isa=AVX2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port, work = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=4, process_id=pid)
    sys.path.insert(0, "__REPO__")
    import numpy as np
    import jax.numpy as jnp
    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.dataset import load_dataset
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.sharding import make_mesh

    mesh = make_mesh()
    assert jax.process_count() == 4 and len(jax.devices()) == 8
    # QUANTIZED design end-to-end: per-process slab read of the shared
    # .bin, int8 quantization with the allgathered global scale
    ds = load_dataset(work + "/ex.bin", work + "/ex.phen", 120, 160,
                      "linear", mesh, jnp.int8)
    assert ds.qscale is not None and ds.qscale.shape == (160,)
    # SHARED eigen cache: the engine builds the factor through
    # build_eigen_cached (writer process saves, decision broadcast), and
    # the artifact files come out of per-host slab writes
    cfg = RunConfig(out_dir=work, out_name="mh4", iterations=3, h2=0.8,
                    probs=[0.9, 0.07, 0.03], vars=[0.0, 1e-3, 1e-2],
                    stop_criteria_thr=0.0, seed=7, trace=0,
                    compute_dtype="int8", lmmse_solver="eigen",
                    eigen_cache=work + "/eig4.npz")
    ts = np.fromfile(work + "/ex_ts.bin")
    res = infere_linear(ds.dm, ds.phen.y, cfg, true_signal=ts,
                        write_outputs=True)
    print("GAMW", repr(res.gamw))
    # every process reloads the same factor the engine just cached
    from jax.experimental import multihost_utils
    from vampomi_tpu.ops.eigen import build_eigen_cached
    from vampomi_tpu.ops.spectral import build_spectral
    multihost_utils.sync_global_devices("engine_cache_saved")
    fac = build_spectral(ds.dm)
    # seed must match the engine's (cfg.seed): the cache stores the build
    # seed and a mismatch correctly rebuilds instead of loading
    ef2, dg2 = build_eigen_cached(fac, work + "/eig4.npz", seed=7)
    assert dg2.get("loaded"), "4-process reload of the engine-built cache"
    from vampomi_tpu.sharding import fetch_global
    print("LAMSUM", repr(float(np.sum(fetch_global(ef2.lam)))))
""").replace("__REPO__", REPO)


def _launch(script, work, nproc, timeout):
    """Launch nproc workers on a fresh coordinator port, retrying the
    whole group when the bound-then-released port gets stolen."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    for attempt in range(3):
        with socket.socket() as sock:
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            sock.bind(("localhost", 0))
            port = str(sock.getsockname()[1])
        procs = [
            subprocess.Popen([sys.executable, str(script), str(i), port, work],
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True, env=env)
            for i in range(nproc)
        ]
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            return outs
        if attempt == 2 or not any("address" in o.lower() for o in outs):
            for p, o in zip(procs, outs):
                assert p.returncode == 0, o[-2000:]
    return outs


@pytest.mark.slow
def test_four_process_int8_eigen_matches_single(tmp_path):
    """4 processes x 2 devices: quantized (int8) design, the eigen-LMMSE
    solver with a shared on-disk factor cache, and per-host slab IO, all
    end-to-end through the engine — artifacts match a single-process run
    over the same 8-device mesh to f32-reduction-order tolerance
    (VERDICT r4 ask #8; reference DCN story SURVEY §2.3,
    src/utilities.cpp:207-239)."""
    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.dataset import load_dataset
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.sharding import make_mesh
    from vampomi_tpu.sim.data_sim import main as sim_main
    import jax.numpy as jnp

    work = str(tmp_path)
    sim_main(["--out-dir", work, "--out-name", "ex",
              "-N", "120", "-M", "160", "--seed", "4"])
    script = tmp_path / "worker4.py"
    script.write_text(WORKER4)
    outs = _launch(script, work, nproc=4, timeout=600)

    gamws = [float(o.split("GAMW")[1].split()[0]) for o in outs]
    assert all(g == gamws[0] for g in gamws)
    lamsums = [float(o.split("LAMSUM")[1].split()[0]) for o in outs]
    assert all(v == lamsums[0] for v in lamsums)

    # single-process run over the same-size mesh, same int8+eigen config
    mesh = make_mesh()
    ds = load_dataset(f"{work}/ex.bin", f"{work}/ex.phen", 120, 160,
                      "linear", mesh, jnp.int8)
    cfg = RunConfig(out_dir=work, out_name="sp4", iterations=3, h2=0.8,
                    probs=[0.9, 0.07, 0.03], vars=[0.0, 1e-3, 1e-2],
                    stop_criteria_thr=0.0, seed=7, trace=0,
                    compute_dtype="int8", lmmse_solver="eigen",
                    eigen_cache=f"{work}/eig_sp4.npz")
    ts = np.fromfile(f"{work}/ex_ts.bin")
    res = infere_linear(ds.dm, ds.phen.y, cfg, true_signal=ts,
                        write_outputs=True)

    # f32 work dtype: process-count changes the psum reduction order, so
    # the bar is f32 tolerance, not the f64 test's 1e-10
    assert abs(res.gamw - gamws[0]) / res.gamw < 1e-5
    for f in ("it_3.bin", "r1_it_3.bin"):
        a = np.fromfile(f"{work}/mh4_{f}")
        b = np.fromfile(f"{work}/sp4_{f}")
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-6)


@pytest.mark.slow
def test_two_process_run_matches_single(tmp_path):
    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.dataset import load_dataset
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.sharding import make_mesh
    from vampomi_tpu.sim.data_sim import main as sim_main
    import jax.numpy as jnp

    work = str(tmp_path)
    sim_main(["--out-dir", work, "--out-name", "ex",
              "-N", "120", "-M", "160", "--seed", "4"])

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}

    # the bound-then-released port can be stolen before the coordinator
    # rebinds it — retry the whole launch on a fresh port if that happens
    for attempt in range(3):
        with socket.socket() as sock:
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            sock.bind(("localhost", 0))
            port = str(sock.getsockname()[1])
        procs = [
            subprocess.Popen([sys.executable, str(script), str(i), port, work],
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True, env=env)
            for i in range(2)
        ]
        outs = [p.communicate(timeout=300)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 2 or not any("address" in o.lower() for o in outs):
            for p, o in zip(procs, outs):
                assert p.returncode == 0, o[-2000:]
    gamws = [float(o.split("GAMW")[1].split()[0]) for o in outs]
    assert gamws[0] == gamws[1]
    qsums = [float(o.split("QSCALESUM")[1].split()[0]) for o in outs]
    assert qsums[0] == qsums[1]
    lamsums = [float(o.split("LAMSUM")[1].split()[0]) for o in outs]
    assert lamsums[0] == lamsums[1]  # both processes reloaded the same factor

    # single-process run over the 8-device mesh in THIS process
    mesh = make_mesh()
    ds = load_dataset(f"{work}/ex.bin", f"{work}/ex.phen", 120, 160,
                      "linear", mesh, jnp.float64)
    cfg = RunConfig(out_dir=work, out_name="sp", iterations=3, h2=0.8,
                    probs=[0.9, 0.07, 0.03], vars=[0.0, 1e-3, 1e-2],
                    stop_criteria_thr=0.0, seed=7, trace=0)
    ts = np.fromfile(f"{work}/ex_ts.bin")
    res = infere_linear(ds.dm, ds.phen.y, cfg, true_signal=ts,
                        write_outputs=True)

    assert abs(res.gamw - gamws[0]) / res.gamw < 1e-9
    # the 2-process allgathered qscale equals the single-process one
    ds8 = load_dataset(f"{work}/ex.bin", f"{work}/ex.phen", 120, 160,
                       "linear", mesh, jnp.int8)
    assert abs(float(np.sum(ds8.qscale)) - qsums[0]) < 1e-12
    # artifact files written by the two processes' slab writes match the
    # single-process files to fp reduction order
    for f in ("it_3.bin", "r1_it_3.bin"):
        a = np.fromfile(f"{work}/mh_{f}")
        b = np.fromfile(f"{work}/sp_{f}")
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-13)
