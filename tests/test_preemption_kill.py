"""Hard-preemption recovery: a training PROCESS killed mid-epoch (os._exit, no
cleanup) restarts, restores the last saved training state, and finishes with
results identical to an uninterrupted run — the restart-based recovery story
SURVEY.md §5 mandates, tested with a real process death rather than an
in-process resume call (tests/test_resume_partition.py covers that)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.multiprocess]


def _run(mode: str, state_dir: Path, out: Path) -> subprocess.CompletedProcess:
    repo_root = Path(__file__).parent.parent
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=os.pathsep.join(
            [str(repo_root)] + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ).rstrip(os.pathsep),
    )
    env.pop("PYTEST_CURRENT_TEST", None)
    return subprocess.run(
        [
            sys.executable,
            str(Path(__file__).parent / "preemption_worker.py"),
            mode,
            str(state_dir),
            str(out),
        ],
        env=env,
        cwd=str(repo_root),
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_kill_and_resume_equals_uninterrupted(tmp_path):
    state_dir = tmp_path / "state"
    state_dir.mkdir()

    straight_out = tmp_path / "straight.json"
    p = _run("straight", state_dir, straight_out)
    assert p.returncode == 0, p.stdout + p.stderr

    crash_out = tmp_path / "crash.json"
    p = _run("crash", state_dir, crash_out)
    assert p.returncode == 17, (p.returncode, p.stdout + p.stderr)
    assert not crash_out.exists()  # died mid-epoch, wrote nothing

    resume_out = tmp_path / "resume.json"
    p = _run("resume", state_dir, resume_out)
    assert p.returncode == 0, p.stdout + p.stderr

    straight = json.loads(straight_out.read_text())
    resumed = json.loads(resume_out.read_text())
    assert resumed["epochs"] == straight["epochs"] == [1, 2, 3]
    np.testing.assert_allclose(resumed["losses"], straight["losses"], rtol=1e-6)
    np.testing.assert_allclose(
        resumed["final_val_auc"], straight["final_val_auc"], atol=1e-6
    )
    np.testing.assert_allclose(
        resumed["param_digest"], straight["param_digest"], rtol=1e-6
    )
