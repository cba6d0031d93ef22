"""The AUC-parity runbook's hermetic smoke mode (VERDICT r2 #6): the full
convert->train->predict->AUC chain runs on the synthetic dataset, so the
runbook cannot rot before the day real data is mountable."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_runbook_smoke_chain(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # run_dir + artifacts under tmp
    from tools.parity_runbook import main

    summary = main(["--dataset", "Synthetic", "--smoke",
                    "--run_dir", str(tmp_path / "runs")])
    assert summary["n_test"] > 0
    assert 0.0 <= summary["AUC"] <= 1.0
    run_dir = Path(summary["run_dir"])
    assert (run_dir / "best_checkpoint.json").exists()
    assert (run_dir / "results" / "results.csv").exists()
    assert (run_dir / "results" / "roc.png").exists()


def test_runbook_artifact_check_fails_fast(tmp_path):
    from tools.parity_runbook import check_artifacts

    with pytest.raises(SystemExit) as e:
        check_artifacts("LIDC", str(tmp_path / "nope"))
    assert "split.csv" in str(e.value)
