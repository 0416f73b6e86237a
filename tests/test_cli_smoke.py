"""CLI smoke: every entry point must import and parse --help cleanly.

Catches import rot / argparse regressions across the whole scripts/ surface
without running any heavy work (argparse exits before compute).
"""

import glob
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(ROOT, "scripts", "*.py"))
    if not os.path.basename(p).startswith("_")
)
# measure_fgd_parity / train_multihost_demo are harness scripts without
# argparse --help contracts; everything user-facing must pass.
HELPLESS = {"eval_common.py"}


@pytest.mark.parametrize("script", [s for s in SCRIPTS if s not in HELPLESS])
def test_cli_help(script):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", script), "--help"],
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
        cwd=ROOT,
    )
    assert proc.returncode == 0, f"{script} --help failed:\n{proc.stderr[-2000:]}"
    assert "usage" in proc.stdout.lower(), script
