"""Subprocess CLI tests (ref System_Tests/Interactive/*: spawn the real
CLI, pipe canned input, assert exit 0 — here with output asserts too)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, stdin=None, timeout=600):  # generous: jax import + eager
    # dispatch take ~1 min alone, and CI machines run other load.
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "run.py", *args],
        cwd=REPO,
        input=stdin,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )


def test_debug_preset_0_subprocess():
    r = _run(["--debug", "0"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "terminal value:" in r.stdout


def test_interactive_quit_subprocess():
    # Option 5 = Quit in the wizard's main menu.
    r = _run(["--interactive"], stdin="5\n")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "What would you like to do?" in r.stdout
