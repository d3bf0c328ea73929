"""Benchmark: MCPC Langevin inference steps/sec/chip on the MNIST MLP.

Headline workload — the reference's posterior-inference chain at full scale
(figure_2.py:167-173: 1000 mixing + 9000 sampling Langevin steps): generative
MLP 20-128-128-784, batch 256 chains, Bernoulli sensory loss, plain-SGD
Langevin steps (grad + N(0, 2*lr) noise) — identical math to the reference's
``random_step`` MCPC loop (utils/model.py:35-44).

Engine: the fused whole-chain Pallas kernel (ops/pallas_mcpc.py) — weights,
latents and RNG stay in VMEM for all T steps.  Headline timing is the
CHIP-RATE: the marginal per-chain time between K=5 and K=1 chains scanned
inside one dispatch (min-of-N each), which cancels the tunnel's fixed
~29 ms dispatch+readback artifact (CLAUDE.md measurement rule).  The
dispatch-inclusive single-chain number is reported alongside in
BENCH_DETAIL.md; if the marginal is unreliable (tunnel jitter swamps the
K-spread on all retries) the headline falls back to it.

Baseline: the reference PyTorch implementation on CPU measured with
benchmarks/measure_reference.py on this machine (147.6 steps/sec at batch
256).  vs_baseline = our steps/sec / reference steps/sec.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
The extended report — fused TRAIN-step throughput (Adam warm start + chain +
Monte-Carlo parameter grads in one dispatch), the batch-scaling curve
(f32/bf16), achieved TFLOP/s and MFU — is written to BENCH_DETAIL.md and
echoed to stderr.

Supervision: the tunneled TPU backend can hang on init for tens of minutes
after a crashed program (it self-recovers — CLAUDE.md).  ``python bench.py``
therefore runs a SUPERVISOR that (1) probes backend init + one tiny dispatch
in a short-timeout subprocess, retrying with backoff while the budget
(``MCPC_BENCH_BUDGET_S``, default 1200 s — worst-case wall-clock must stay
under the driver's ~27 min kill window, see ``worst_case_wallclock_s``;
BENCH_r04.json recorded the rc=124 that a 3300 s default caused) lasts,
then (2) runs the actual
benchmark in an inner subprocess (``MCPC_BENCH_INNER=1``).  On final failure
it still prints a parseable JSON line with an explicit ``"error"`` field and
exits 0, so the driver's record is never an unparseable rc=1.
"""

import json
import os as _os
import sys
import time

import jax
import jax.numpy as jnp

# the axon plugin hangs backend RESOLUTION unless the platform choice is
# also pinned via config (env alone is not honored — CLAUDE.md gotcha), so
# mirror any JAX_PLATFORMS override into the config
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat and _plat.strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# measured via benchmarks/measure_reference.py (PyTorch CPU, batch 256)
REFERENCE_CPU_STEPS_PER_SEC = 147.6

# Supervisor schedule.  The driver that records BENCH_r{N}.json SIGKILLs the
# process somewhere in [1606 s, 1906 s) (observed in BENCH_r04.json, rc=124
# — the failure-JSON never printed).  The guarantee "always exit 0 with one
# JSON line" only holds if the WORST-CASE supervisor wall-clock fits under
# that window, so the default budget is sized for worst case < 1500 s; see
# worst_case_wallclock_s() and tests/test_bench_supervisor.py.
DEFAULT_BUDGET_S = 1200.0
PROBE_TIMEOUT_S = 150.0
# Cold-compile caveat: under the default budget the inner run gets
# ~1050-1170 s, which covers warm-cache runs with huge margin but can
# SIGKILL a fully COLD T=10000 Mosaic compile mid-flight (the persistent
# /tmp/jax_tpu_cache makes this rare; compiles are host/tunnel-side, so a
# kill there is far less wedge-prone than one mid-dispatch, and the
# sub-second chain dispatches keep that window tiny).  The alternative —
# a budget exceeding the driver's kill window — is strictly worse: the
# driver then SIGKILLs at an arbitrary point anyway AND the record is an
# unparseable rc=124 (BENCH_r04.json).  Long-budget runs (the round
# runbook) override via MCPC_BENCH_BUDGET_S and leave the cache warm for
# the driver's capture.


def worst_case_wallclock_s(budget_s: float = DEFAULT_BUDGET_S) -> float:
    """Upper bound on supervisor wall-clock for a given budget.

    Every sleep and subprocess timeout is clamped to the remaining budget:
    a probe launched just before the deadline gets min(PROBE_TIMEOUT_S,
    max(remaining, 30)) — overshoot < 30 s — and the inner run's timeout IS
    the remaining budget (no overshoot).  PROBE_TIMEOUT_S + 30 is kept as a
    conservative bound covering subprocess teardown (SIGKILL + reap after a
    TimeoutExpired) and printing the final JSON line.
    """
    return budget_s + PROBE_TIMEOUT_S + 30.0

BATCH = 256
T = 10000  # reference posterior-inference chain length (figure_2.py:171-172)
if _os.environ.get("MCPC_BENCH_SMOKE") == "1":
    # test hook: a tiny chain so the supervisor's success path can be
    # exercised end-to-end on CPU (tests/test_bench_supervisor.py)
    T = 50
DIMS = (20, 128, 128, 784)
XW = DIMS[0] + DIMS[1] + DIMS[2]          # packed latent width
OW = DIMS[1] + DIMS[2] + DIMS[3]          # packed output width
# USEFUL matmul work per direction per row: sum of k*n over the real layer
# dims — implementation-independent (the kernel may dispatch more, e.g. the
# block-diagonal layout's zero blocks or the aligned padding)
USEFUL = sum(a * b for a, b in zip(DIMS[:-1], DIMS[1:]))
# v5e single-chip peak (bf16 MXU); all MFU figures = useful-FLOPs / bf16
# peak, i.e. "fraction of the chip's matmul ceiling doing real work"
PEAK_FLOPS = 197e12


def _log(line: str, lines: list):
    print(line, file=sys.stderr)
    lines.append(line)


def _median_time(fn, reps=5):
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        v = fn(2 + i)
        times.append(time.perf_counter() - t0)
        assert all(x == x for x in v), "non-finite output"
    times.sort()
    return times[len(times) // 2]


def _min_time(fn, reps=7):
    """Min-of-N: the right statistic for MARGINAL fits — the tunnel's
    per-dispatch latency has heavy positive noise that medians don't fully
    reject, and a marginal difference of two medians amplifies it."""
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        v = fn(2 + i)
        times.append(time.perf_counter() - t0)
        assert all(x == x for x in v), "non-finite output"
    return min(times)


def make_train_chunk(model, params, key, batch, k, warm_T=250, mixing=50,
                     sampling=100, bf16=False):
    """K fused TRAIN steps per dispatch (experiments/train_mnist.py
    pipeline): per batch, Adam MAP warm start + Langevin chain +
    Monte-Carlo pgrads + Adam p-update, scanned over k stacked batches.
    A single tunneled dispatch costs ~29 ms regardless of work, which
    would dominate one ~5 ms train step — the marginal per-batch time
    from two k values is the honest throughput.  Shared with
    benchmarks/trainstep_bench.py (the standalone harness) so the train
    recipe exists in exactly one place."""
    import optax

    from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

    opt_p = optax.adam(0.01)
    data = (jax.random.uniform(key, (k, batch, DIMS[3])) > 0.5).astype(
        jnp.float32
    )

    @jax.jit
    def run_chunk(params, opt_state, rkey, data_k):
        def body(carry, d):
            params, opt_state, rkey = carry
            rkey, k_lat, k_seed = jax.random.split(rkey, 3)
            latents = model.init_latents(
                params, jnp.zeros((batch, DIMS[0])), k_lat
            )
            seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
            _, pg = mcpc_chain_pallas(
                params, latents, d, seed,
                T=mixing + sampling, lr=0.1, noise_var=2.0,
                loss="bernoulli", mixing=mixing, with_pgrads=True,
                warm_T=warm_T, warm_lr=0.7, bf16_matmul=bf16,
            )
            g = jax.tree_util.tree_map(
                lambda x: x / (sampling * batch), pg
            )
            updates, opt_state = opt_p.update(g, opt_state, params)
            return (
                optax.apply_updates(params, updates), opt_state, rkey
            ), None

        (params, opt_state, rkey), _ = jax.lax.scan(
            body, (params, opt_state, rkey), data_k
        )
        return params, opt_state

    def run(seed):
        p, _ = run_chunk(
            params, opt_p.init(params), jax.random.PRNGKey(seed), data
        )
        return (float(p[3]["w"][0, 0]),)

    return run


def main():
    import montecarlopredictivecoding_tpu as mcpc
    from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

    model = mcpc.make_mlp_model(*DIMS)
    key = jax.random.PRNGKey(0)
    params = model.init(key)

    def make_inputs(batch):
        inputs = jnp.zeros((batch, DIMS[0]))
        latents = model.init_latents(params, inputs, key)
        target = (jax.random.uniform(key, (batch, DIMS[3])) > 0.5).astype(
            jnp.float32
        )
        return latents, target

    def make_chain(batch, bf16=False):
        latents, target = make_inputs(batch)

        def run(seed):
            out, _ = mcpc_chain_pallas(
                params, latents, target, jnp.int32(seed),
                T=T, lr=0.01, noise_var=2.0, loss="bernoulli", packed=True,
                bf16_matmul=bf16,
            )
            # forced readback: the only reliable sync on the tunneled
            # platform.  ONE transfer — each round trip costs ~30 ms, and
            # reading any element fully synchronizes the kernel (all outputs
            # of the single pallas_call complete together); the two probe
            # scalars are stacked device-side first.
            import numpy as _np

            v = _np.asarray(jnp.stack([out[0][0, 0], out[2][0, 0]]))
            return (float(v[0]), float(v[1]))

        return run

    def make_chain_scan(batch, k, bf16=False):
        """K independent T-step chains scanned inside ONE dispatch (distinct
        seeds), one readback.  The marginal per-chain time between two k
        values cancels the tunnel's fixed ~29 ms dispatch+readback — the
        chip-rate a user on local TPU hardware actually gets (CLAUDE.md:
        never judge per-step cost from a single tunneled dispatch)."""
        latents, target = make_inputs(batch)

        @jax.jit
        def run_k(seed0):
            def body(acc, i):
                out, _ = mcpc_chain_pallas(
                    params, latents, target, seed0 + i,
                    T=T, lr=0.01, noise_var=2.0, loss="bernoulli",
                    packed=True, bf16_matmul=bf16,
                )
                return acc + out[0][0, 0] + out[2][0, 0], None

            acc, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32)
            )
            return acc

        def run(seed):
            return (float(run_k(jnp.int32(seed))),)

        return run

    detail = []
    _log("# BENCH_DETAIL — fused-kernel benchmark (single chip)", detail)
    _log("", detail)
    _log(f"Model {DIMS}, packed widths xw={XW} ow={OW}.  Single-dispatch", detail)
    _log("timings (median of 5) include dispatch + host readback over the", detail)
    _log("tunneled chip; marginal rows cancel that fixed ~29 ms artifact.", detail)
    _log("", detail)

    # ---- headline: inference chain at B=256, f32 ---------------------------
    try:
        run = make_chain(BATCH)
        run(1)  # compile
        # the tunnel's per-call latency is noisy run to run; a wider median
        # stabilizes the headline
        dt = _median_time(run, reps=11)
        engine_fallback = False
    except Exception as e:  # kernel unavailable on this platform
        _log(f"kernel path failed ({type(e).__name__}: {e}); engine fallback", detail)
        from montecarlopredictivecoding_tpu.core.engine import (
            EngineConfig, EngineState, build_train_on_batch,
        )
        from montecarlopredictivecoding_tpu.core.optim import OptimizerSpec
        from montecarlopredictivecoding_tpu.core.schedule import build_plan

        latents, target = make_inputs(BATCH)
        cfg = EngineConfig(
            plan=build_plan(T, update_x_at="all", update_p_at="never"),
            optimizer_x=OptimizerSpec("sgd", lr=0.01),
            optimizer_p=None, langevin_var=2.0,
            loss_fn=mcpc.bernoulli_fn, capture_every_t=False,
        )
        fn = jax.jit(build_train_on_batch(model, cfg))

        def run(seed):
            st = EngineState(
                params=params, latents=latents,
                opt_x_state=cfg.optimizer_x.make().init({"latents": latents}),
                opt_p_state=None, lr_scale=jnp.ones(()),
                key=jax.random.PRNGKey(seed),
            )
            ns, res = fn(st, jnp.zeros((BATCH, DIMS[0])), {"_target": target})
            return (float(res["overall"][-1]), float(ns.latents[0][0, 0]))

        run(1)
        dt = _median_time(run)
        engine_fallback = True

    steps_per_sec = T / dt
    # inference chain: forward + backward matmul pass per step
    chain_flops = T * 2 * 2.0 * BATCH * USEFUL
    _log("## Headline — Langevin inference chain (B=256, T=10000, f32)", detail)
    _log("", detail)
    dt_chip = None
    if not engine_fallback:
        # chip-rate: marginal per chain from K=5 vs K=1 chains per dispatch.
        # A single T=10000 dispatch is ~60 ms of which ~29 ms is the fixed
        # tunnel dispatch+readback — a harness artifact local hardware
        # doesn't pay.  Guarded: a marginal implying >75% useful-MFU means
        # tunnel jitter swamped the K-spread; retry, then fall back to the
        # dispatch-inclusive number.
        try:
            K_HI = 5
            run1 = make_chain_scan(BATCH, 1)
            runK = make_chain_scan(BATCH, K_HI)
            run1(1), runK(1)
            for _attempt in range(3):
                m = (_min_time(runK, reps=5) - _min_time(run1, reps=5)) / (
                    K_HI - 1
                )
                if m > 0 and chain_flops / m <= 0.75 * PEAK_FLOPS:
                    dt_chip = m
                    break
        except Exception as e:
            _log(f"(chip-rate marginal failed: {type(e).__name__}: {e})",
                 detail)
    if dt_chip is not None:
        steps_per_sec = T / dt_chip
        _log(f"- {steps_per_sec:,.1f} steps/s chip-rate "
             f"({dt_chip * 1e3:.1f} ms/chain, "
             f"{dt_chip / T * 1e6:.2f} us/step; K-chain marginal, fixed "
             "tunnel dispatch+readback cancelled)", detail)
        _log(f"- single dispatch incl. tunnel dispatch+readback: "
             f"{T / dt:,.1f} steps/s ({dt * 1e3:.1f} ms/chain)", detail)
        _log(f"- {chain_flops / dt_chip / 1e12:.2f} useful TFLOP/s = "
             f"{chain_flops / dt_chip / PEAK_FLOPS * 100:.1f}% useful-MFU "
             "(vs bf16 peak)", detail)
    else:
        _log(f"- {steps_per_sec:,.1f} steps/s ({dt * 1e3:.1f} ms/chain, "
             f"{dt / T * 1e6:.2f} us/step)", detail)
        _log(f"- {chain_flops / dt / 1e12:.2f} useful TFLOP/s = "
             f"{chain_flops / dt / PEAK_FLOPS * 100:.1f}% useful-MFU (vs bf16 peak)", detail)
    _log(f"- engine fallback: {engine_fallback}", detail)
    _log("", detail)

    if not engine_fallback:
        # ---- fused train step (amortized: marginal per batch over a scanned
        # chunk, cancelling the fixed tunnel dispatch cost) -------------------
        warm_T, mixing, sampling = 250, 50, 100
        T_tr = mixing + sampling
        k_lo, k_hi = 2, 18
        _log("## Fused train step (Adam warm 250 + chain 150 + MC pgrads "
             "+ Adam p-update)", detail)
        _log("", detail)
        k_hi_small = 66
        _log(f"Marginal per-batch time from k={k_lo} vs k={k_hi} "
             f"(k={k_hi_small} below B=1024) batches scanned per dispatch "
             "(the train_mnist pipeline).", detail)
        _log("", detail)
        _log("Caveat: marginal fits inherit the tunnel's run-to-run "
             "latency variance (~2x spread observed across repeated "
             "runs); treat single-run rows as a ballpark, cross-check "
             "with benchmarks/trainstep_bench.py.", detail)
        _log("", detail)
        for batch, bf16 in ((256, False), (256, True), (1024, False), (1024, True)):
            # small batches need a wider k spread: at B=256 a ~1 ms/batch
            # marginal over 16 batches is inside the tunnel's jitter band
            k_hi_b = k_hi if batch >= 1024 else k_hi_small
            # warm/chain: fwd+bwd matmul pass per step; pgrad pass per
            # accumulating step
            flops = (
                (warm_T + T_tr) * 2 + sampling * 1
            ) * 2.0 * batch * USEFUL
            try:
                run_lo = make_train_chunk(model, params, key, batch, k_lo,
                                          warm_T, mixing, sampling, bf16)
                run_hi = make_train_chunk(model, params, key, batch, k_hi_b,
                                          warm_T, mixing, sampling, bf16)
                run_lo(1), run_hi(1)
                # a fit whose implied useful-MFU is impossible (>75% of
                # peak) means tunnel latency variance swamped the marginal
                # difference — retry rather than report nonsense
                dt, mfu = 0.0, float("inf")
                for _attempt in range(3):
                    dt = (_min_time(run_hi) - _min_time(run_lo)) / (
                        k_hi_b - k_lo
                    )
                    mfu = flops / dt / PEAK_FLOPS if dt > 0 else float("inf")
                    if 0.0 < mfu <= 0.75:
                        break
            except Exception as e:
                _log(f"- B={batch} {'bf16' if bf16 else 'f32 '}: failed "
                     f"({type(e).__name__})", detail)
                continue
            if not (0.0 < mfu <= 0.75):
                _log(f"- B={batch} {'bf16' if bf16 else 'f32 '}: unreliable "
                     f"fit after 3 attempts (marginal {dt * 1e3:.3f} ms/batch "
                     f"implies {mfu * 100:.0f}% useful-MFU) — tunnel "
                     "variance swamped the k-spread; see "
                     "benchmarks/trainstep_bench.py", detail)
                continue
            total_steps = warm_T + T_tr
            _log(
                f"- B={batch} {'bf16' if bf16 else 'f32 '}: "
                f"{1.0 / dt:,.1f} train-batches/s, "
                f"{batch / dt:,.0f} images/s, "
                f"{total_steps / dt:,.0f} inference-steps/s, "
                f"{flops / dt / 1e12:.2f} useful TFLOP/s "
                f"({flops / dt / PEAK_FLOPS * 100:.1f}% useful-MFU)",
                detail,
            )
        _log("", detail)

        # ---- batch-scaling curve (inference chain) --------------------------
        _log("## Batch scaling — inference chain (T=10000)", detail)
        _log("", detail)
        _log("| batch | precision | steps/s | chain-sample-steps/s | useful TFLOP/s | useful-MFU |", detail)
        _log("|---|---|---|---|---|---|", detail)
        for batch in (256, 1024, 4096):
            for bf16 in (False, True):
                try:
                    run = make_chain(batch, bf16)
                    run(1)
                    dt = _median_time(run)
                except Exception as e:
                    _log(f"| {batch} | {'bf16' if bf16 else 'f32'} | failed "
                         f"({type(e).__name__}) | | | |", detail)
                    continue
                flops = T * 2 * 2.0 * batch * USEFUL
                _log(
                    f"| {batch} | {'bf16' if bf16 else 'f32'} "
                    f"| {T / dt:,.0f} | {batch * T / dt:,.0f} "
                    f"| {flops / dt / 1e12:.2f} "
                    f"| {flops / dt / PEAK_FLOPS * 100:.1f}% |",
                    detail,
                )
        _log("", detail)
        _log("Roofline note: at B=256 the chain is latency-bound (serial", detail)
        _log("step dependency, ~4 us/step floor) and runs the fused", detail)
        _log("block-diagonal matmul; at B>=512 the kernel switches to", detail)
        _log("per-layer matmuls (matmul_layout='auto') and becomes", detail)
        _log("compute/VPU-bound — batches beyond one VMEM tile grid-tile", detail)
        _log("over the batch dimension.", detail)

    try:
        out_path = (
            "/tmp/BENCH_DETAIL_smoke.md"
            if _os.environ.get("MCPC_BENCH_SMOKE") == "1"
            else "BENCH_DETAIL.md"
        )
        with open(out_path, "w") as f:
            f.write("\n".join(detail) + "\n")
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "Langevin inference steps/sec/chip (MNIST MLP, batch 256, T=10000 chain)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2),
            }
        )
    )


def _failure_json(reason: str) -> str:
    """A still-parseable headline line recording WHY no number was measured
    (VERDICT r3 missing #1: an rc=1 with no JSON made round 3's perf work
    officially invisible)."""
    return json.dumps(
        {
            "metric": "Langevin inference steps/sec/chip (MNIST MLP, batch 256, T=10000 chain)",
            "value": 0.0,
            "unit": "steps/sec",
            "vs_baseline": 0.0,
            "error": reason,
        }
    )


def _relay_tcp_state(ports=(8082, 8083), host=None, timeout_s=3.0):
    """Classify the axon tunnel's TCP legs without touching jax.

    The tunneled backend has two distinct failure modes that a timed-out
    probe can't tell apart: the loopback relay itself down (TCP connect
    refused on the claim/init ports — observed round 5, >24 h) versus the
    relay up but the remote claim wedged (TCP accepts, init hangs — the
    round-3/4 wedge).  Ports: 8082 is the claim leg, 8083 the init leg
    (axon client docs).  Returns a compact human-readable string, or None
    when the platform is pinned to CPU (relay state is irrelevant there).
    """
    import os
    import socket

    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if plat and plat != "axon":
        return None
    host = host or os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0]
    states = []
    for port in ports:
        try:
            with socket.create_connection((host, port), timeout=timeout_s):
                states.append(f"{port} open")
        except (ConnectionRefusedError, OSError) as e:
            kind = "refused" if isinstance(e, ConnectionRefusedError) else (
                "timeout" if isinstance(e, socket.timeout) else "error"
            )
            states.append(f"{port} {kind}")
    return "relay TCP: " + ", ".join(states)


def _probe_backend(timeout_s: float) -> bool:
    """Backend init + one tiny dispatch + readback in a short-timeout
    subprocess.  A wedged tunneled chip hangs `jax.devices()` indefinitely;
    probing in a killable child keeps the supervisor responsive."""
    import os
    import subprocess

    code = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS', '').strip().lower()\n"
        "if p == 'cpu':\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "v = float(jnp.ones(()) + 1.0)\n"
        "assert v == 2.0, v\n"
        "print('probe-ok', jax.default_backend())\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "probe-ok" in proc.stdout


def _supervise() -> None:
    """Retry-with-backoff wrapper: probe until the backend answers (the
    wedge self-recovers in tens of minutes), then run the benchmark in an
    inner subprocess.  Always prints exactly one JSON line and exits 0."""
    import os
    import subprocess

    budget = float(os.environ.get("MCPC_BENCH_BUDGET_S", str(DEFAULT_BUDGET_S)))
    deadline = time.monotonic() + budget
    env = dict(os.environ)
    env["MCPC_BENCH_INNER"] = "1"

    probe_timeout, backoff = PROBE_TIMEOUT_S, 60.0
    probed_ok = False
    probed_ok_ever = False
    inner_attempts = 0
    while time.monotonic() < deadline:
        remaining = deadline - time.monotonic()
        if not probed_ok:
            print(
                f"[bench supervisor] probing backend "
                f"(timeout {probe_timeout:.0f}s, budget {remaining:.0f}s)",
                file=sys.stderr,
            )
            if not _probe_backend(min(probe_timeout, max(remaining, 30.0))):
                sleep_s = min(backoff, max(deadline - time.monotonic(), 0.0))
                relay = _relay_tcp_state()
                if sleep_s <= 0:
                    break
                print(
                    f"[bench supervisor] backend unreachable"
                    f"{' (' + relay + ')' if relay else ''}; retrying in "
                    f"{sleep_s:.0f}s",
                    file=sys.stderr,
                )
                time.sleep(sleep_s)
                backoff = min(backoff * 1.6, 300.0)
                continue
            probed_ok = True
            probed_ok_ever = True
        remaining = deadline - time.monotonic()
        if remaining < 120:
            break
        print(
            f"[bench supervisor] backend up; running benchmark "
            f"(timeout {remaining:.0f}s)",
            file=sys.stderr,
        )
        inner_attempts += 1
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True,
                text=True,
                timeout=remaining,
            )
        except subprocess.TimeoutExpired as e:
            # killing a mid-dispatch TPU program can wedge the chip for a
            # long time — do NOT retry after a timeout kill; report.
            sys.stderr.write((e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or ""))
            print(_failure_json("benchmark timed out under supervisor budget"))
            return
        sys.stderr.write(proc.stderr)
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("{") and '"metric"' in ln
            ),
            None,
        )
        if proc.returncode == 0 and line is not None:
            print(line)
            return
        print(
            f"[bench supervisor] inner run failed (rc={proc.returncode}); "
            f"stdout tail: {proc.stdout[-500:]!r}",
            file=sys.stderr,
        )
        probed_ok = False  # re-probe before any retry
        time.sleep(min(backoff, max(deadline - time.monotonic(), 0.0)))
        backoff = min(backoff * 1.6, 300.0)
    if inner_attempts:
        print(
            _failure_json(
                f"backend reachable but inner benchmark failed "
                f"{inner_attempts} time(s) within the supervisor budget"
            )
        )
    elif probed_ok_ever:
        print(
            _failure_json(
                "backend reachable but the remaining supervisor budget left "
                "no time for an inner benchmark attempt"
            )
        )
    else:
        relay = _relay_tcp_state()
        print(
            _failure_json(
                "backend unreachable for the whole supervisor budget"
                + (f" ({relay})" if relay else "")
            )
        )


if __name__ == "__main__":
    import os

    if os.environ.get("MCPC_BENCH_INNER") == "1":
        if os.environ.get("MCPC_BENCH_TEST_INNER_FAIL") == "1":
            # test hook: force an inner failure so the supervisor's
            # "reachable but inner failed" reason path can be exercised
            sys.exit(3)
        main()
    else:
        _supervise()
