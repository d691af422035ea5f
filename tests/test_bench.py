"""bench.py orchestrator: hang-proofing contract.

The driver's only requirement is ONE parseable JSON line, no matter what
the backend does (BENCH_r03 was rc=124 with zero output when jax backend
init hung).  These tests exercise the subprocess plumbing and fallback
logic without any device."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeCompleted:
    def __init__(self, stdout, rc=0):
        self.stdout = stdout
        self.stderr = ""
        self.returncode = rc


def test_run_stage_parses_last_json_line(monkeypatch):
    """Warnings/chatter before the JSON line must not break parsing."""
    bench = _load_bench()
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _FakeCompleted(
            "WARNING: platform axon is experimental\n"
            "{\"bogus\": 1}\nnot json {\n"
            "{\"steps_per_s\": 16.2, \"compile_s\": 3.0}\n"))
    out, err = bench._run_stage("train", timeout_s=5)
    assert err is None and out == {"steps_per_s": 16.2, "compile_s": 3.0}


def test_run_stage_no_json_reports_tail(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _FakeCompleted("Traceback ...\nRuntimeError: boom\n",
                                       rc=1))
    out, err = bench._run_stage("train", timeout_s=5)
    assert out is None and "rc=1" in err and "boom" in err


def test_run_stage_timeout_reports_error(monkeypatch):
    bench = _load_bench()

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=k.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out, err = bench._run_stage("train", timeout_s=1)
    assert out is None and "timeout" in err


def test_collect_artifacts_never_raises(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.chdir(tmp_path)        # no results/, no logs: still fine
    assert isinstance(bench._collect_artifacts(), dict)


def test_stale_fallback_value(tmp_path, monkeypatch, capsys):
    """Dead backend: the JSON line still prints, carrying the last good
    measurement marked stale plus the probe errors."""
    bench = _load_bench()
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(bench, "HISTORY_PATH",
                        str(tmp_path / "results" / "bench_history.json"))
    os.makedirs("results")
    json.dump({"date": "2026-08-21 07:24", "steps_per_s": 16.2,
               "extra": {}}, open(bench.HISTORY_PATH, "w"))

    monkeypatch.setattr(bench, "_run_stage",
                        lambda name, t, extra_env=None:
                        (None, f"{name}: timeout after {t}s"))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["value"] == 16.2
    assert d["extra"]["stale_measurement_from"] == "2026-08-21 07:24"
    assert any("probe" in e for e in d["extra"]["errors"])


def test_no_history_fallback_is_zero(tmp_path, monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(bench, "HISTORY_PATH",
                        str(tmp_path / "results" / "none.json"))
    monkeypatch.setattr(bench, "_run_stage",
                        lambda name, t, extra_env=None: (None, f"{name}: x"))
    bench.main()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 0.0 and d["extra"]["errors"]
