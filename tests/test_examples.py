"""The examples must keep running (in-process, tiny shapes, CPU mesh)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv):
    spec = importlib.util.spec_from_file_location(
        "_example_" + os.path.basename(script)[:-3],
        os.path.join(REPO, "examples", script))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [script] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_streaming_demo(capsys):
    _run("streaming_demo.py", ["--cpu", "--batches", "3",
                               "--batch-size", "400", "--d", "16"])
    out = capsys.readouterr().out
    assert "recall@1(vs live window)" in out


def test_multichip_demo(capsys):
    _run("multichip_demo.py", ["--cpu", "--n", "2000", "--d", "16",
                               "--n-cells", "16"])
    out = capsys.readouterr().out
    assert "sharded flat sweep" in out
