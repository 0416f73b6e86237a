"""SAG training CLI smoke: the in-training FGD hook (reference
SAG_trainer.py:153-163,218-235) must evaluate with the frozen evaluator,
log eval_fgd, and keep the best checkpoint."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_sag_fgd_hook(tmp_path):
    env = dict(os.environ)
    env["LS_TPU_PLATFORM"] = "cpu"  # honoured by jax_setup.setup()
    save_dir = str(tmp_path / "sag_run")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "scripts", "train_sag.py"),
            "--dataset", "synthetic", "--epochs", "2",
            "--eval_interval", "1", "--save_interval", "1",
            "--clip_layers", "1", "--latent_dim", "32",
            "--batch_size", "8", "--log_interval", "1",
            "--save_dir", save_dir,
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "new best FGD" in proc.stdout
    assert os.path.exists(os.path.join(save_dir, "sag_best.npz"))
    # eval_fgd must appear in the KV log (table on stderr and/or log files)
    logged = proc.stdout + proc.stderr + "".join(
        open(os.path.join(save_dir, f)).read()
        for f in os.listdir(save_dir)
        if f.endswith((".json", ".csv", ".txt"))
    )
    assert "eval_fgd" in logged
