"""Lint gate — the reference's flake8 discipline, stdlib-reimplemented.

The reference CI runs flake8 with ``max-line-length = 100``
(`/root/reference/setup.cfg`, `.travis/flake.sh`); no third-party linter is
installed in this environment, so `scripts/lint.py` provides the checks and
this test makes them a CI gate.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lint_clean():
    result = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, 'scripts', 'lint.py')],
        capture_output=True, text=True, cwd=REPO_ROOT)
    assert result.returncode == 0, '\n' + result.stdout + result.stderr
