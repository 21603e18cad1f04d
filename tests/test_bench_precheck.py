"""bench.py's backend precheck must survive transient tunnel blips: failed
probes retry with backoff, the error JSON (emitted only after every retry
fails) carries the probe history, and a mid-sequence recovery proceeds
without error (VERDICT r3 item 7 — r3 lost its only driver-captured
headline to a single-probe precheck)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_precheck_retries_then_emits_history(bench, monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(bench, "_probe_once",
                        lambda t: (calls.append(t), (False, "timeout>1s"))[1])
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    monkeypatch.setenv("SH_TPU_BENCH_PRECHECK_ATTEMPTS", "3")
    monkeypatch.setenv("SH_TPU_BENCH_PRECHECK_BACKOFF", "7")
    monkeypatch.delenv("SH_TPU_BENCH_NO_PRECHECK", raising=False)

    with pytest.raises(SystemExit) as exc:
        bench._precheck_backend(timeout_sec=1)
    assert exc.value.code == 2
    assert len(calls) == 3
    assert sleeps == [7.0, 14.0]  # escalating backoff, none after the last

    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] is None
    assert "unreachable" in out["error"]
    assert out["probe_history"] == ["timeout>1s"] * 3


def test_precheck_recovers_mid_sequence(bench, monkeypatch, capsys):
    results = iter([(False, "timeout>1s"), (True, "ok")])
    monkeypatch.setattr(bench, "_probe_once", lambda t: next(results))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("SH_TPU_BENCH_PRECHECK_ATTEMPTS", "3")
    monkeypatch.delenv("SH_TPU_BENCH_NO_PRECHECK", raising=False)

    bench._precheck_backend(timeout_sec=1)  # no SystemExit
    assert capsys.readouterr().out == ""  # no error JSON on stdout


def test_precheck_skip_env(bench, monkeypatch):
    monkeypatch.setenv("SH_TPU_BENCH_NO_PRECHECK", "1")
    monkeypatch.setattr(bench, "_probe_once",
                        lambda t: pytest.fail("probe must not run"))
    bench._precheck_backend()
