"""Script surface smoke tests: every numbered script parses --help; the
offline generators run end-to-end on a synthetic tree."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = sorted((REPO / "scripts").glob("[01]*.py"))

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_script_help(script):
    r = subprocess.run(
        [sys.executable, str(script), "--help"], capture_output=True,
        text=True, env=ENV, cwd=str(REPO), timeout=180)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()


def test_generator_scripts_end_to_end(tmp_path):
    clean = tmp_path / "Training"
    args = ["--clean-dir", str(clean), "--synthetic",
            "--synthetic-classes", "2", "--synthetic-per-class", "2"]
    for script, dst in (("02_gen_noise.py", "Noise"),
                        ("16_gen_compound_data.py", "Compound")):
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / script), *args,
             "--dst", str(tmp_path / dst)],
            capture_output=True, text=True, env=ENV, cwd=str(REPO),
            timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        files = list((tmp_path / dst).glob("*/*"))
        assert len(files) == 4, r.stdout


def test_synthetic_tree_rebuilt_if_partial(tmp_path):
    """An interrupted --synthetic build (marker present, count short) must
    be rebuilt on the next run; unmarked trees are never touched."""
    clean = tmp_path / "Training"
    args = ["--clean-dir", str(clean), "--synthetic",
            "--synthetic-classes", "2", "--synthetic-per-class", "3"]

    def run01():
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "01_download_data.py"),
             *args], capture_output=True, text=True, env=ENV, cwd=str(REPO),
            timeout=180)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run01()
    imgs = sorted(clean.glob("*/*.ppm"))
    assert len(imgs) == 6 and (clean / ".synthetic").exists()
    for p in imgs[:3]:
        p.unlink()  # simulate an interrupted write
    out = run01()
    assert "incomplete" in out and "rebuilding" in out.lower(), out
    assert len(list(clean.glob("*/*.ppm"))) == 6

    # no marker (simulating real data): left alone even with odd counts
    (clean / ".synthetic").unlink()
    imgs = sorted(clean.glob("*/*.ppm"))
    imgs[0].unlink()
    run01()
    assert len(list(clean.glob("*/*.ppm"))) == 5
