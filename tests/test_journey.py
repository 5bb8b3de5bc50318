"""Tiny-tree full user journey over the numbered scripts (VERDICT r3 task 6).

Drives the reference's documented workflow (ref README.md:133-144) —
01 data -> 02 noise tree -> 05 judge -> 07 restorer -> 08 restore ->
09 accuracy report — end-to-end as subprocesses on a 2-class x 4-image
32 px tree, asserting each stage's artifacts exist and parse. This covers
the user-facing script surface that unit tests (library API) and
demo_run.sh (manual, TPU) don't.
"""

import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")


def run(script, *extra, cwd, common):
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *common, *extra],
        capture_output=True, text=True, env=ENV, cwd=str(cwd), timeout=900)
    assert r.returncode == 0, f"{script}\n{r.stdout[-1500:]}\n{r.stderr[-2500:]}"
    return r.stdout


def test_numbered_script_journey(tmp_path):
    clean = tmp_path / "data" / "gtsrb" / "Training"
    ckpt = tmp_path / "ckpt"
    common = ["--clean-dir", str(clean), "--ckpt-dir", str(ckpt),
              "--image-size", "32", "--synthetic",
              "--synthetic-classes", "2", "--synthetic-per-class", "4"]

    out = run("01_download_data.py", cwd=tmp_path, common=common)
    assert "Data ready" in out
    n_clean = len(list(clean.glob("*/*")))
    assert n_clean == 8

    run("02_gen_noise.py", cwd=tmp_path, common=common)
    noise = tmp_path / "data" / "processed" / "Noise"
    assert len(list(noise.glob("*/*"))) == 8

    run("05_train_baseline.py", "--epochs", "2", "--batch-size", "4",
        "--optimizer", "adamw", cwd=tmp_path, common=common)
    assert (ckpt / "vgg16_baseline").exists()

    run("07_train_restoration.py", "--task", "noise", "--epochs", "1",
        "--batch-size", "4", "--identity-frac", "0.25",
        cwd=tmp_path, common=common)
    assert (ckpt / "restoration_noise").exists()

    out = run("08_run_inference.py", "--tasks", "noise", "--batch-size", "4",
              cwd=tmp_path, common=common)
    restored = tmp_path / "data" / "restored" / "Noise"
    assert len(list(restored.glob("*/*"))) == 8, out
    assert re.search(r"PSNR", out), out

    out = run("09_test_baseline.py", "--batch-size", "4",
              cwd=tmp_path, common=common)
    accs = re.findall(r"Result \[(.+?)\] Accuracy: ([0-9.]+)%", out)
    names = [n for n, _ in accs]
    assert any("Clean" in n for n in names), out
    assert any("Noise (Distorted)" in n for n in names), out
    assert any("Noise" in n and "Restored" in n for n in names), out
    for _, v in accs:
        assert 0.0 <= float(v) <= 100.0


def test_unified_script_journey(tmp_path):
    """Unified leg (ref README chain 16->14->17->18->15): compound tree ->
    unified ResUNet train -> unified restore -> fused benchmark -> demo."""
    clean = tmp_path / "data" / "gtsrb" / "Training"
    ckpt = tmp_path / "ckpt"
    common = ["--clean-dir", str(clean), "--ckpt-dir", str(ckpt),
              "--image-size", "32", "--synthetic",
              "--synthetic-classes", "2", "--synthetic-per-class", "4"]

    run("01_download_data.py", cwd=tmp_path, common=common)
    run("16_gen_compound_data.py", cwd=tmp_path, common=common)
    compound = tmp_path / "data" / "processed" / "Compound"
    assert len(list(compound.glob("*/*"))) == 8

    # judge first (18 needs it); tiny budget
    run("05_train_baseline.py", "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adamw", cwd=tmp_path, common=common)
    run("14_train_unified_advanced.py", "--epochs", "1",
        "--batch-size", "4", cwd=tmp_path, common=common)
    assert (ckpt / "resunet_unified").exists() or list(ckpt.glob("*uni*"))

    out = run("17_run_unified_inference.py", "--batch-size", "4",
              "--metrics", cwd=tmp_path, common=common)
    restored = tmp_path / "data" / "restored" / "Compound"
    assert len(list(restored.glob("*/*"))) == 8, out

    out = run("18_test_unified_benchmark.py", "--batch-size", "4",
              "--fused", cwd=tmp_path, common=common)
    accs = re.findall(r"Accuracy: ([0-9.]+)%", out)
    assert accs, out

    out = run("15_test_unified.py", "--out",
              str(tmp_path / "demo.png"), cwd=tmp_path, common=common)
    assert (tmp_path / "demo.png").exists(), out


def test_viz_interpret_script_journey(tmp_path):
    """Viz/interpretability leg (ref:10-13): comparison grid, hidden-state
    heatmaps, UMAP .pt export, cascade stress figures — on a tiny tree with
    1-epoch models (artifact existence + schema, not quality)."""
    clean = tmp_path / "data" / "gtsrb" / "Training"
    ckpt = tmp_path / "ckpt"
    common = ["--clean-dir", str(clean), "--ckpt-dir", str(ckpt),
              "--image-size", "32", "--synthetic",
              "--synthetic-classes", "2", "--synthetic-per-class", "4"]

    run("01_download_data.py", cwd=tmp_path, common=common)
    for s in ("02_gen_noise.py", "03_gen_blur.py", "04_gen_fog.py"):
        run(s, cwd=tmp_path, common=common)
    run("05_train_baseline.py", "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adamw", cwd=tmp_path, common=common)
    for task in ("noise", "blur", "fog"):
        run("07_train_restoration.py", "--task", task, "--epochs", "1",
            "--batch-size", "4", cwd=tmp_path, common=common)
    run("08_run_inference.py", "--batch-size", "4", cwd=tmp_path,
        common=common)

    run("10_visualize_result.py", "--out", str(tmp_path / "grid.png"),
        cwd=tmp_path, common=common)
    assert (tmp_path / "grid.png").exists()

    run("11_visualize_hidden_states.py", "--out",
        str(tmp_path / "hidden.png"), cwd=tmp_path, common=common)
    assert (tmp_path / "hidden.png").exists()

    run("12_generate_umap_pt.py", "--samples-per-mode", "8",
        "--out-pt", str(tmp_path / "emb.pt"),
        "--out-img", str(tmp_path / "emb.png"), cwd=tmp_path, common=common)
    import torch
    d = torch.load(str(tmp_path / "emb.pt"), weights_only=False)
    # schema of the reference's shipped artifact (ref:12:145-150)
    assert set(d) >= {"embeddings", "labels", "original_features"}
    assert d["embeddings"].shape[1] == 2
    assert d["original_features"].shape[1] == 512

    out = run("13_pipeline_stress_test.py", "--num-samples", "2",
              "--out-dir", str(tmp_path / "pr"), cwd=tmp_path, common=common)
    figs = list((tmp_path / "pr").glob("pipeline_sample_*.png"))
    assert len(figs) == 2, out
    assert "confidence" in out.lower(), out


def test_pick_winner(tmp_path):
    """Sweep winner picker: ranking, truncated-JSON tolerance, fallback."""
    sys.path.insert(0, str(REPO / "benchmarks"))
    import pick_winner

    def result(bands, compound, mild):
        means = {"clean": 0.999, "noise": 0.3, "blur": 0.5, "fog": 0.6,
                 "compound": compound, "mild_conf": mild}
        import json
        return json.dumps({"mean": means, "std": {}, "runs": [],
                           "bands_hit": bands, "bands_total": 6})

    # no logs at all -> fallback
    name, flags, r = pick_winner.pick(tmp_path)
    assert name == pick_winner.FALLBACK and r is None

    (tmp_path / "T30.log").write_text("noise\n" + result(4, 0.15, 0.90))
    (tmp_path / "T30s64.log").write_text(result(5, 0.09, 0.80))
    # truncated final line (timeout mid-print) must fall back to the
    # previous parseable line
    (tmp_path / "T45s64.log").write_text(
        result(6, 0.08, 0.75) + "\n" + result(6, 0.08, 0.75)[:50])
    name, flags, r = pick_winner.pick(tmp_path)
    assert name == "T45s64" and r["bands_hit"] == 6
    assert "--size 64" in flags

    # ties broken by distance to the reference on the two open bands
    (tmp_path / "T45s64.log").write_text(result(5, 0.14, 0.95))
    name, _, _ = pick_winner.pick(tmp_path)
    assert name == "T30s64"


def test_demo_run_resume_skip(tmp_path):
    """demo_run.sh skips completed stages via .done_* sentinels.

    With every sentinel present the script must finish in seconds without
    invoking a single training stage — the property that makes a relay
    outage cost one stage instead of the whole ~2h run."""
    stages = ["01_data", "02_noise", "03_blur", "04_fog", "16_compound",
              "05_judge", "06_eval", "07_noise", "07_fog", "07_blur",
              "08_restore", "09_eval", "14_unified", "17_restore",
              "18_bench", "10_viz", "11_hidden", "13_stress", "15_demo",
              "12_umap"]
    for s in stages:
        (tmp_path / f".done_{s}").touch()
    r = subprocess.run(
        ["bash", str(REPO / "benchmarks" / "demo_run.sh")],
        capture_output=True, text=True, timeout=120,
        env=dict(ENV, WORKDIR=str(tmp_path)))
    assert r.returncode == 0, r.stderr[-1500:]
    assert "DEMO RUN COMPLETE" in r.stdout
    assert r.stdout.count("already done") == len(stages)
    # the sentinel list above must stay in sync with the script
    script = (REPO / "benchmarks" / "demo_run.sh").read_text()
    assert set(re.findall(r"^stage (\S+)", script, re.M)) == set(stages)


def test_sweep_table(tmp_path, capsys):
    """Sweep-log -> markdown table renderer (docs/CALIBRATION.md input)."""
    import json
    import subprocess

    means = {"clean": 0.995, "noise": 0.31, "blur": 0.48, "fog": 0.61,
             "compound": 0.09, "mild_conf": 0.78}
    rec = json.dumps({"mean": means, "std": {k: 0.01 for k in means},
                      "runs": [means] * 3, "bands_hit": 6, "bands_total": 6})
    (tmp_path / "T30s64.log").write_text("noise line\n" + rec)
    ms = tmp_path / "multiseed.log"
    ms.write_text(rec)
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "sweep_table.py"),
         str(tmp_path), "--multiseed", str(ms)],
        capture_output=True, text=True, check=True).stdout
    lines = out.splitlines()
    assert lines[0].startswith("| config | levers |")
    # one row per sweep config + header + separator + multiseed row
    assert "| T30s64 |" in out and "**6/6**" in out
    assert "×3 seeds" in out and "9.0±1.0" in out
    # configs with no log render as placeholder rows, not crashes
    assert "| T45 |" in out and "— |" in out


def test_ship_winner(tmp_path):
    """Winner-shipping rewrites the single-sourced defaults in place."""
    sys.path.insert(0, str(REPO / "benchmarks"))
    import ship_winner

    # fake repo = real files copied into the expected layout
    (tmp_path / "tsr_tpu" / "data").mkdir(parents=True)
    (tmp_path / "benchmarks").mkdir()
    syn = tmp_path / "tsr_tpu" / "data" / "synthetic.py"
    demo = tmp_path / "benchmarks" / "demo_run.sh"
    syn.write_text((REPO / "tsr_tpu" / "data" / "synthetic.py").read_text())
    demo.write_text((REPO / "benchmarks" / "demo_run.sh").read_text())

    win = ship_winner.parse_flags(
        "--size 64 --size-jitter 0.4 --calib size_small_frac=0.3 "
        "--epochs 24".split())
    changes = ship_winner.ship(tmp_path, win)
    assert len(changes) == 4
    text = syn.read_text()
    assert "\nTREE_SIZE = 64\n" in text
    assert "\nTREE_JITTER = 0.4\n" in text
    assert '"size_small_frac": 0.3,' in text
    assert "EPOCHS_JUDGE=${EPOCHS_JUDGE:-24}" in demo.read_text()

    # the shipped file must still be importable with the new values
    import importlib.util
    spec = importlib.util.spec_from_file_location("syn_shipped", syn)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.TREE_SIZE == 64 and mod.CALIB["size_small_frac"] == 0.3

    # tuple-valued knobs keep their trailing comments intact; an
    # epochs-less winner must NOT touch the demo's judge-epoch default
    win2 = ship_winner.parse_flags(["--calib", "smear_len=2.0,5.0"])
    ship_winner.ship(tmp_path, win2)
    assert '"smear_len": (2.0, 5.0),' in syn.read_text()
    assert "EPOCHS_JUDGE=${EPOCHS_JUDGE:-24}" in demo.read_text()

    # a knob the regex can't find fails loudly, not silently
    import pytest
    with pytest.raises(SystemExit, match="expected exactly 1 match"):
        ship_winner.ship(tmp_path,
                         ship_winner.parse_flags(["--calib", "nope=1"]))

    # unknown flags are rejected (the winner string is machine-produced;
    # a pick_winner format drift must not half-apply)
    with pytest.raises(SystemExit, match="unrecognized"):
        ship_winner.parse_flags(["--veil", "0.3"])
