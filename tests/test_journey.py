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
