"""CLI smoke tests (stream contract + flags) on the cpu platform."""

import io
import subprocess
import sys

import pytest

SMALL = "/root/reference/small"
ENV = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo",
       "PATH": "/usr/bin:/bin:/usr/local/bin"}


def _run(args, stdin_text, cwd="/root/reference"):
    return subprocess.run(
        [sys.executable, "-m", "radixhashjoin_tpu", *args],
        input=stdin_text, capture_output=True, text=True, cwd=cwd,
        env=ENV, timeout=300)


@pytest.fixture(scope="module")
def tiny_stream():
    with open(f"{SMALL}/small.work") as f:
        lines = [l for l in f][:3]
    init = "".join(f"./small/r{i}\n" for i in range(14))
    return init + "Done\n" + "".join(lines) + "F\n"


def test_cli_null_and_selfjoin():
    out = _run([], "./small/r0\nDone\n0|0.0=123456789|0.0\nF\n")
    assert out.returncode == 0 and out.stdout == "NULL\n"


def test_cli_backend_flags_agree(tiny_stream):
    a = _run(["--backend", "dense"], tiny_stream)
    b = _run(["--backend", "sort"], tiny_stream)
    c = _run(["--oracle"], tiny_stream)
    assert a.returncode == b.returncode == c.returncode == 0
    assert a.stdout == b.stdout == c.stdout
    assert a.stdout.count("\n") == 3


def test_cli_missing_relation_graceful():
    out = _run([], "no_such_file\nDone\n")
    assert out.returncode == 1
    assert "cannot load relations" in out.stderr


def test_cli_malformed_query_graceful():
    out = _run([], "./small/r0\nDone\ngarbage\nF\n")
    assert out.returncode == 1
    assert "malformed work stream" in out.stderr
