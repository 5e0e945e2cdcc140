"""The one-command quality gate must stay runnable while weights are absent.

Exercises tools/quality_run.py --dry-run end-to-end: synthesized micro
dataset -> model build -> demo pair -> val submission -> offline evaluator.
(The real-weights path differs only in checkpoint conversion + thresholds,
both locked by their own tests: test_parity_full_model / test_evaluation.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_quality_dry_run(tmp_path, monkeypatch):
    monkeypatch.setenv("MICKEY_TOY_EXAMPLE", str(tmp_path / "missing"))  # skip slow demo leg
    import quality_run

    rc = quality_run.main(["--dry-run", "--out", str(tmp_path / "q")])
    assert rc == 0
    assert (tmp_path / "q" / "submission.zip").exists()
