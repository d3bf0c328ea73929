"""Variance-aware f32 vs bf16 A/B for the fused TRAIN step (VERDICT r3
weak #2).

Round 3's single-run marginal fits contradicted the `use_pallas_bf16='auto'`
rule (bf16 "+28% at B=1024" vs a final BENCH_DETAIL where B=1024 bf16 was
slower and B=256 bf16 faster) — with the tunnel's ~2x run-to-run latency
variance, one fit per condition is noise.  This harness repeats the marginal
per-batch fit N times per (batch, precision) cell, interleaving conditions
(so tunnel drift hits all cells equally), and reports median / IQR plus a
pairwise win-rate.  The trainer rule (core/trainer.py use_pallas_bf16) must
then agree with whatever separates here — or be deleted if nothing does.

Match workload: the table-1 training pipeline (/root/reference/table_1.py:38-44)
via bench.make_train_chunk (Adam warm 250 + chain 150 + MC pgrads + Adam
p-update, scanned batches per dispatch).

Run on the TPU: python benchmarks/bf16_ab.py [--rounds 9]
Writes BF16_AB.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=9)
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--out", default="BF16_AB.md",
                    help="report filename (repo root); use e.g. "
                    "BF16_AB_4096.md to keep a landed report intact")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    import montecarlopredictivecoding_tpu as mcpc
    from bench import make_train_chunk  # repo-root bench.py

    batches = [int(b) for b in args.batches.split(",")]
    DIMS = (20, 128, 128, 784)
    model = mcpc.make_mlp_model(*DIMS)
    key = jax.random.PRNGKey(0)
    params = model.init(key)

    # k spreads per batch (mirrors bench.py: wider at small batch so the
    # marginal clears the tunnel jitter band)
    k_lo = 2

    def k_hi(B):
        # measured spreads; other batches get the wide-batch default
        return {256: 66, 1024: 18, 4096: 18}.get(B, 18)

    runners = {}
    for B in batches:
        for bf16 in (False, True):
            runners[(B, bf16, "lo")] = make_train_chunk(
                model, params, key, B, k_lo, bf16=bf16
            )
            runners[(B, bf16, "hi")] = make_train_chunk(
                model, params, key, B, k_hi(B), bf16=bf16
            )
    # compile everything first
    for r in runners.values():
        r(1)

    def min_time(fn, reps=5):
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(2 + i)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    cells = {(B, bf16): [] for B in batches for bf16 in (False, True)}
    for rnd in range(args.rounds):
        # interleave conditions within each round so slow tunnel drift is
        # shared across cells instead of biasing whichever ran last
        for B in batches:
            for bf16 in (False, True):
                lo = min_time(runners[(B, bf16, "lo")])
                hi = min_time(runners[(B, bf16, "hi")])
                dt = (hi - lo) / (k_hi(B) - k_lo)
                cells[(B, bf16)].append(dt)
        print(f"round {rnd + 1}/{args.rounds} done", flush=True)

    lines = ["# BF16_AB — fused train step, repeated marginal fits", "",
             f"{args.rounds} interleaved rounds; min-of-5 per (k, cell) "
             "point; marginal = (t_hi - t_lo)/(k_hi - k_lo).", "",
             "| batch | prec | median batches/s | median ms/batch | IQR ms | n |",
             "|---|---|---|---|---|---|"]
    for B in batches:
        for bf16 in (False, True):
            v = np.array(cells[(B, bf16)]) * 1e3  # ms
            med = float(np.median(v))
            q1, q3 = np.percentile(v, [25, 75])
            lines.append(
                f"| {B} | {'bf16' if bf16 else 'f32 '} "
                f"| {1e3 / med:,.1f} | {med:.3f} | {q3 - q1:.3f} | {len(v)} |"
            )
    lines.append("")
    for B in batches:
        f32 = np.array(cells[(B, False)])
        bf = np.array(cells[(B, True)])
        n = min(len(f32), len(bf))
        wins = int((bf[:n] < f32[:n]).sum())
        ratio = float(np.median(f32) / np.median(bf))
        lines.append(
            f"- B={B}: bf16 wins {wins}/{n} paired rounds; "
            f"median speedup x{ratio:.3f} "
            f"({'bf16 faster' if ratio > 1 else 'f32 faster'})"
        )
    lines.append("")
    lines.append("Decision rule: adopt bf16 at a batch size only if it wins "
                 ">=7/9 paired rounds AND the median speedup is >=5% "
                 "(outside the tunnel noise floor); otherwise keep f32.")

    out = "\n".join(lines) + "\n"
    print(out)
    with open(os.path.join(os.path.dirname(__file__), "..", args.out),
              "w") as f:
        f.write(out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
