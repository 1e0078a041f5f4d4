"""main.py CLI smoke: the spark-submit entry point end-to-end (--synthetic)."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_synthetic_run_and_resume():
    base = tempfile.mkdtemp(prefix="ercs_cli_")
    cmd = [
        sys.executable,
        os.path.join(REPO, "main.py"),
        "--synthetic",
        "--base-dir", base,
        "--threshold", "0.38",
        "--master", "local[4]",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    result = json.loads(line)
    assert result["n_docs"] > 0 and result["n_clusters"] > 0

    # resume: second run must reuse committed stages and match
    out2 = subprocess.run(cmd, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out2.returncode == 0, out2.stderr[-2000:]
    line2 = [l for l in out2.stdout.splitlines() if l.strip().startswith("{")][-1]
    result2 = json.loads(line2)
    assert result2["n_clusters"] == result["n_clusters"]
    shutil.rmtree(base, ignore_errors=True)
