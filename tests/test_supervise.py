"""Failure recovery: run.py --supervise restarts a crashed run from the
newest checkpoint (fault injected via the OT_FAULT_INJECT_* chaos hook)."""

import os

import numpy as np
import yaml

from tests.test_e2e import make_config, make_corpus


def test_supervised_restart_resumes(tmp_path, monkeypatch):
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_corpus(root, n_utts=24)  # 3 batches/epoch at batch_size 8
    conf = make_config(root)
    cfg = yaml.safe_load(open(conf))
    cfg["train"]["epochs"] = 3
    yaml.safe_dump(cfg, open(conf, "w"))
    expdir = os.path.join(root, "exp")
    marker = os.path.join(root, "fault.marker")

    # the supervised child inherits env: force CPU there too, and arm a
    # one-shot crash at global step 6 (mid-epoch-1, after epoch 0 saved)
    monkeypatch.setenv("OT_FORCE_PLATFORM", "cpu")
    monkeypatch.setenv("OT_FAULT_INJECT_STEP", "6")
    monkeypatch.setenv("OT_FAULT_INJECT_MARKER", marker)

    rc = run_main(["-c", conf, "--expdir", expdir, "--log_interval", "100",
                   "--supervise", "2"])
    assert rc == 0
    # the injected fault actually fired once (at step >= 6) ...
    assert os.path.exists(marker), "fault never injected"
    assert int(open(marker).read()) >= 6
    # ... and the restarted run still completed all epochs
    for e in range(3):
        assert os.path.isdir(os.path.join(expdir, f"model.epoch.{e}")), e


def test_fault_inject_disarms(tmp_path, monkeypatch):
    """Without a supervisor: the marker file makes the injection one-shot, so
    a manual -ct rerun completes."""
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_corpus(root, n_utts=24)
    conf = make_config(root)
    cfg = yaml.safe_load(open(conf))
    cfg["train"]["epochs"] = 2
    yaml.safe_dump(cfg, open(conf, "w"))
    expdir = os.path.join(root, "exp")
    marker = os.path.join(root, "fault.marker")
    monkeypatch.setenv("OT_FAULT_INJECT_STEP", "2")
    monkeypatch.setenv("OT_FAULT_INJECT_MARKER", marker)

    import pytest

    with pytest.raises(RuntimeError, match="fault injection"):
        run_main(["-c", conf, "--expdir", expdir, "--log_interval", "100"])
    assert os.path.exists(marker)
    # manual resume (reference-style -ct) now runs to completion
    assert run_main(["-c", conf, "--expdir", expdir, "--log_interval", "100",
                     "-ct"]) == 0
    assert os.path.isdir(os.path.join(expdir, "model.epoch.1"))
