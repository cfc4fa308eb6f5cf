"""Probit (bin_class) production-scale run with the int8 design, the
eigen-LMMSE solver, and a TRUTH-FREE warm-start prior.

Completes the production-evidence story for the second model family: the
round-2 probit artifact (PRODUCTION_RUN.json "probit") ran f32/CG with the
prior fixed at the oracle truth; this runs the same documented workflow as
the linear "em_credible_r03" artifact — conf_gibbs_init .conf +
--init-conf — with a probit-specific marginal-moment prior:

  b_j = A_j^T (y - ybar) over binary labels.  Under the liability model
  y = 1{A x + eps > 0} with small per-marker effects, E[b_j] ≈ φ(0)·x_j
  (the probit attenuation of a binary-outcome marginal regression), so the
  1-D mixture EM over b (tools/production_run.py fit_marginal_mixture)
  estimates (lambda, slab var·φ(0)²); dividing by φ(0)² = 0.15915 maps the
  slab variance back to the liability scale.  No use of true beta/lam/h2.

Reference parity: bin_class driver src/main_meth_probit.cpp (folded into
one CLI per SURVEY Q2), GLM-VAMP loop src/vamp_probit.cpp:19-467.

Usage: python tools/probit_production.py [--small]
Appends "probit_em_credible_r03" to PRODUCTION_RUN.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.production_run import fit_marginal_mixture, write_conf  # noqa: E402
from vampomi_tpu.cli import load_init_conf  # noqa: E402
from vampomi_tpu.config import RunConfig  # noqa: E402
from vampomi_tpu.dataset import load_dataset  # noqa: E402
from vampomi_tpu.engine.probit import infere_bin_class  # noqa: E402
from vampomi_tpu.modes.association import pvals_se  # noqa: E402
from vampomi_tpu.ops.operator import atx  # noqa: E402
from vampomi_tpu.sim.data_sim import simulate_iid, write_fixture  # noqa: E402

PHI0 = float(1.0 / np.sqrt(2.0 * np.pi))  # standard normal density at 0


def main():
    small = "--small" in sys.argv
    if small:
        jax.config.update("jax_platforms", "cpu")
    n, m = (512, 8192) if small else (8192, 262144)
    lam_true, h2_true = 0.002, 0.8
    iters = 6 if small else 20
    seed = 23

    out = {"shape": dict(M=m, N=n, dtype="int8", solver="eigen",
                         model="bin_class")}
    t0 = time.time()
    fx = simulate_iid(n=n, m=m, lam=lam_true, h2=h2_true, seed=seed)
    # binary labels from the liability z = A_std beta_internal: reuse the
    # simulated X, standardize columns, probit threshold at 0 (balanced)
    workdir = tempfile.mkdtemp(prefix="prod_probit_r03_")
    files = write_fixture(fx, workdir, "prodp")
    # liability on the INTERNAL scale the engine uses: A = (X-mu)/sd/sqrt(N),
    # x_internal = beta * sqrt(N)
    mu = fx.X.mean(axis=0)
    sd = np.sqrt(((fx.X - mu) ** 2).sum(axis=0) / (n - 1))
    z_lia = ((fx.X - mu) / sd) @ fx.beta  # = A @ (beta*sqrt(N))
    rng = np.random.default_rng(seed + 1)
    # scale liability to unit noise: z + N(0,1) — same construction as the
    # round-2 probit artifact (y = 1{X beta + N(0,1) > 0})
    y_bin = (z_lia + rng.normal(size=n) > 0).astype(np.float64)
    phen_path = os.path.join(workdir, "prodp_bin.phen")
    with open(phen_path, "w") as f:
        for i, v in enumerate(y_bin):
            f.write(f"F{i} I{i} {int(v)}\n")
    out["sim_seconds"] = round(time.time() - t0, 1)
    out["case_fraction"] = float(y_bin.mean())
    print(f"simulated: case fraction {y_bin.mean():.3f}", flush=True)

    # production ingest: bin_class phenotypes are NOT standardized
    # (reference data.cpp:40-43)
    t0 = time.time()
    ds = load_dataset(files["bin"], phen_path, n=n, mt=m, model="bin_class",
                      mesh=None, compute_dtype=jnp.int8)
    out["ingest_seconds"] = round(time.time() - t0, 1)

    # ---- truth-free probit marginal prior ----
    t0 = time.time()
    yc = jnp.asarray(y_bin - y_bin.mean(), dtype=ds.dm.wd)
    bhat = np.asarray(jax.device_get(jax.jit(atx)(ds.dm, yc)),
                      dtype=np.float64)[:m]
    lam_hat, v0_hat, v1_hat = fit_marginal_mixture(bhat)
    v1_liability = v1_hat / (PHI0 * PHI0)   # undo probit attenuation
    var_file = v1_liability / n             # internal (x N) -> file units
    h2_hat = min(lam_hat * m * var_file, 0.95)
    out["prior_estimate"] = dict(
        lam_hat=lam_hat, slab_var_liability_internal=v1_liability,
        h2_hat=h2_hat, seconds=round(time.time() - t0, 1),
        truth_for_reference=dict(lam=lam_true, h2=h2_true,
                                 slab_var_file=h2_true / (lam_true * m)),
    )
    print(f"probit marginal prior: lam={lam_hat:.4g} h2={h2_hat:.3f} "
          f"(truth lam={lam_true}, h2={h2_true})", flush=True)

    conf_path = os.path.join(workdir, "prodp.conf")
    write_conf(conf_path, lam_hat, var_file, h2_hat, rho=0.5)
    conf = load_init_conf(conf_path)
    out["conf"] = conf

    common = dict(
        out_dir=workdir, out_name="prodp", meth_file=files["bin"],
        model="bin_class", probs=conf["probs"], vars=conf["vars"],
        h2=conf["h2"], rho=conf["rho"], gam1=1e-6, stop_criteria_thr=0.0,
        seed=11, trace=0, lmmse_solver="eigen", compute_dtype="int8",
        CG_max_iter=500, CG_err_tol=1e-5,
    )

    # ---- main run: warm-start prior FIXED ----
    t0 = time.time()
    cfg = RunConfig(iterations=iters, learn_prior_delay=iters + 1, **common)
    res = infere_bin_class(ds.dm, ds.phen.y, cfg, true_signal=fx.beta,
                           write_outputs=True)
    secs = time.time() - t0
    corr = float(np.corrcoef(res.x1_hat_scaled, fx.beta)[0, 1])
    # metrics row: [tp1,tn1,fp1,fn1,acc1,x1corr, tp2,tn2,fp2,fn2,acc2,x2corr]
    mrow = [float(v) for v in res.metrics_history[-1]]
    out["fixed_warmstart_run"] = dict(
        iterations=res.iterations_run, wall_seconds=round(secs, 1),
        final_metrics_row=mrow,
        accuracy_denoising=mrow[4], accuracy_lmmse=mrow[10],
        corr_vs_truth=corr,
    )
    print(f"fixed warm-start probit: corr={corr:.4f} acc={mrow[4]:.4f} "
          f"({secs:.0f}s)", flush=True)

    # ---- diagnostic: EM ON from the same warm start ----
    t0 = time.time()
    cfg_em = RunConfig(iterations=max(8, iters // 2), learn_prior_delay=1,
                       **common)
    cfg_em = cfg_em.replace(out_name="prodp_em")
    res_em = infere_bin_class(ds.dm, ds.phen.y, cfg_em, true_signal=fx.beta,
                              write_outputs=False)
    corr_em = float(np.corrcoef(res_em.x1_hat_scaled, fx.beta)[0, 1])
    out["em_on_diagnostic"] = dict(
        iterations=res_em.iterations_run,
        wall_seconds=round(time.time() - t0, 1), corr_vs_truth=corr_em,
    )
    print(f"EM-on diagnostic: corr={corr_em:.4f}", flush=True)

    # ---- SE association from the probit r1 (truth only for scoring) ----
    r1_path = os.path.join(workdir, f"prodp_r1_it_{res.iterations_run}.bin")
    # pvals_se takes FILE-units r1 (= internal / sqrt(N)), exactly as
    # modes/association.py run_association_test feeds it
    r1 = np.fromfile(r1_path, dtype="<f8")[:m]
    pv = pvals_se(r1, float(res.gam1), n)
    thr = 0.05 / m
    sig = pv < thr
    causal = np.abs(fx.beta) > 0
    out["association_se"] = dict(
        bonferroni_threshold=thr,
        true_positives=int((sig & causal).sum()),
        false_positives=int((sig & ~causal).sum()),
        causal_markers=int(causal.sum()),
    )
    print(f"probit SE association: TP={out['association_se']['true_positives']} "
          f"FP={out['association_se']['false_positives']} of "
          f"{int(causal.sum())}", flush=True)

    out["note"] = (
        "Probit production run with NO ground-truth input to inference: "
        "int8 quantized design + eigen-LMMSE, truth-free probit marginal-"
        "moment prior (phi(0)^2 attenuation-corrected, consumed via the "
        "conf_gibbs_init .conf + --init-conf path), fixed-prior GLM-VAMP.  "
        "Truth used only to SCORE corr/TP/FP afterwards."
    )

    path = os.path.join(_ROOT, "PRODUCTION_RUN.json")
    try:
        full = json.load(open(path))
    except Exception:
        full = {}
    full["probit_em_credible_r03"] = out
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print(f"wrote {path}")

    if "--keep" not in sys.argv:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
