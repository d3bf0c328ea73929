"""Fused train-step throughput, tunnel-latency-free.

One tunneled dispatch costs ~29 ms regardless of work, which dominates a
single train step (~5 ms of compute) and made the naive per-dispatch MFU
numbers meaningless.  This bench scans the full train step (Adam warm 250 +
chain 150 + MC pgrads + Adam p-update) over K stacked batches in ONE
dispatch — exactly experiments/train_mnist.py's pipeline — and fits the
marginal per-batch time from two K values.

The train-chunk recipe and the min-of-N marginal statistic live in bench.py
(make_train_chunk/_min_time) — this is the standalone wide-K harness around
them, not a second implementation.

Run: python benchmarks/trainstep_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import montecarlopredictivecoding_tpu as mcpc

# single source of the flagship dims / useful-FLOP accounting / train recipe
from bench import DIMS, USEFUL, _min_time, make_train_chunk

WARM_T, MIXING, SAMPLING = 250, 50, 100
K_LO, K_HI = 2, 26


def main():
    assert jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(*DIMS)
    params0 = model.init(key)

    print("| B | prec | marginal ms/batch | images/s | us/step | useful TFLOP/s | MFU(bf16 peak) |")
    print("|---|---|---|---|---|---|---|")
    for B, bf16 in ((256, False), (256, True), (1024, False), (1024, True), (4096, False)):
        lo_run = make_train_chunk(model, params0, key, B, K_LO,
                                  WARM_T, MIXING, SAMPLING, bf16)
        hi_run = make_train_chunk(model, params0, key, B, K_HI,
                                  WARM_T, MIXING, SAMPLING, bf16)
        lo_run(0), hi_run(1)  # compile
        lo, hi = _min_time(lo_run, reps=9), _min_time(hi_run, reps=9)
        per_batch = (hi - lo) / (K_HI - K_LO)
        steps = WARM_T + MIXING + SAMPLING
        fl = (steps * 2 + SAMPLING) * 2.0 * B * USEFUL
        print(
            f"| {B} | {'bf16' if bf16 else 'f32'} | {per_batch*1e3:.2f} "
            f"| {B/per_batch:,.0f} | {per_batch/steps*1e6:.2f} "
            f"| {fl/per_batch/1e12:.2f} | {fl/per_batch/197e12*100:.1f}% |"
        )


if __name__ == "__main__":
    main()
    print("TRAINSTEP_BENCH_DONE")
