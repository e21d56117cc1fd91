"""bench.py must ALWAYS print one parseable JSON line (rc 0).

Round-1 failure mode: the TPU backend raised during *init* — a fast
terminal error the hang watchdog never saw — and bench.py crashed with
rc=1 and no output, making the round's perf invisible to the driver.
The fix wraps main() so any exception falls back to the cached
last-good payload (marked stale). These tests run bench.py in a
subprocess with `jax` shadowed by a module that raises on import,
simulating an unreachable backend.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_with_broken_jax(tmp_path, cwd):
    shadow = tmp_path / "shadow"
    shadow.mkdir()
    (shadow / "jax").mkdir()
    (shadow / "jax" / "__init__.py").write_text(
        "raise RuntimeError('Unable to initialize backend (simulated)')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(shadow)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, BENCH],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=120,
    )


def test_backend_failure_emits_stale_json(tmp_path):
    out = _run_with_broken_jax(tmp_path, REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "mrays_per_s"
    assert payload["unit"] == "Mrays/s"
    assert payload.get("stale") is True
    assert "vs_baseline" in payload and "value" in payload
    # with bench_last.json present the cached measured value is replayed
    if os.path.isfile(os.path.join(REPO, "bench_last.json")):
        with open(os.path.join(REPO, "bench_last.json")) as f:
            cached = json.load(f)
        assert payload["value"] == cached["value"]


def test_backend_failure_without_cache_still_emits_json(tmp_path):
    # run from an empty cwd via an absolute bench path; LAST_GOOD lives next
    # to bench.py, so simulate no-cache by checking the zero-placeholder
    # shape through the module's helper instead of deleting the real cache
    sys.path.insert(0, REPO)
    try:
        import importlib

        bench = importlib.import_module("bench")
        orig = bench.LAST_GOOD
        bench.LAST_GOOD = str(tmp_path / "definitely_missing.json")
        try:
            payload = bench._stale_payload("test")
        finally:
            bench.LAST_GOOD = orig
    finally:
        sys.path.remove(REPO)
    assert payload["metric"] == "mrays_per_s"
    assert payload["stale"] is True
    assert payload["value"] == 0.0
