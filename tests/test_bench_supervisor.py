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
    detail = REPO / "BENCH_DETAIL.md"
    before = detail.read_bytes() if detail.exists() else None
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
    after = detail.read_bytes() if detail.exists() else None
    assert after == before, "smoke run modified BENCH_DETAIL.md"


def _import_bench():
    """Import bench.py with its compile-cache config side effects undone
    (bench.py flips the cache dir to /tmp/jax_tpu_cache at import; the CPU
    suite must keep /tmp/jax_test_cache — CLAUDE.md)."""
    import jax

    saved = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
    )
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.pop(0)
        jax.config.update("jax_compilation_cache_dir", saved[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", saved[1])
    return bench


def test_supervisor_worst_case_fits_driver_kill_window():
    """BENCH_r04.json was rc=124: the driver SIGKILLed the supervisor
    mid-backoff (observed kill somewhere in [1606 s, 1906 s)) because the
    3300 s default budget exceeded the kill window, so the guaranteed
    failure-JSON never printed.  Pin the schedule: the DEFAULT budget's
    worst-case wall-clock (all probes + backoffs + teardown + final print)
    must stay under 1500 s."""
    bench = _import_bench()
    assert bench.worst_case_wallclock_s() < 1500.0
    # the bound must scale with the env override, not silently cap
    assert bench.worst_case_wallclock_s(600.0) < bench.worst_case_wallclock_s()


def test_relay_tcp_state_classifies_open_refused_and_cpu():
    """The failure JSON's relay diagnostic must distinguish 'relay TCP down'
    (connect refused — observed round 5, >24 h outage) from 'relay up but
    claim wedged' (TCP accepts, backend init hangs — the round-3/4 wedge),
    and stay silent when the platform is pinned to CPU."""
    import socket

    bench = _import_bench()

    # a real listener → "open"; a closed ephemeral port → "refused"
    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    open_port = lsock.getsockname()[1]
    csock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    csock.bind(("127.0.0.1", 0))
    closed_port = csock.getsockname()[1]
    csock.close()  # bound-then-closed: guaranteed unused right now
    try:
        env_platforms = os.environ.pop("JAX_PLATFORMS", None)
        try:
            os.environ["JAX_PLATFORMS"] = "axon"
            state = bench._relay_tcp_state(
                ports=(open_port, closed_port), host="127.0.0.1", timeout_s=2.0
            )
            assert state == (
                f"relay TCP: {open_port} open, {closed_port} refused"
            ), state
            os.environ["JAX_PLATFORMS"] = "cpu"
            assert bench._relay_tcp_state(ports=(open_port,)) is None
        finally:
            if env_platforms is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = env_platforms
    finally:
        lsock.close()


def test_supervisor_reports_inner_failure_distinctly():
    """When the backend is reachable but the inner benchmark keeps failing,
    the failure JSON must say so — not 'backend unreachable' (advisor r4)."""
    proc = _run_bench(
        {
            "JAX_PLATFORMS": "cpu",
            "MCPC_BENCH_TEST_INNER_FAIL": "1",
            "MCPC_BENCH_BUDGET_S": "130",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        },
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _headline(proc.stdout)
    assert "inner benchmark failed" in rec["error"], rec
    assert "unreachable" not in rec["error"]
