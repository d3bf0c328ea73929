"""Measure the reference implementation's MCPC Langevin inference throughput
(steps/sec) on CPU — the denominator for bench.py's vs_baseline.

Workload: MNIST generative MLP (20-128-128-784), batch 256, Bernoulli sensory
loss, plain-SGD Langevin chain with the random_step noise callback — the
posterior-inference hot loop of /root/reference (figure_2.py:167-173 scale).

Run:  python benchmarks/measure_reference.py
"""
import sys, time
sys.path.insert(0, "/root/reference")

import torch
import torch.nn as nn
import torch.optim as optim
import predictive_coding as pc
from utils.model import random_step, bernoulli_fn, sample_x_fn

def main(batch=256, T=300):
    torch.manual_seed(0)
    gen = nn.Sequential(
        nn.Linear(20, 20), pc.PCLayer(sample_x_fn=sample_x_fn), nn.ReLU(),
        nn.Linear(20, 128), pc.PCLayer(sample_x_fn=sample_x_fn), nn.ReLU(),
        nn.Linear(128, 128), pc.PCLayer(sample_x_fn=sample_x_fn), nn.ReLU(),
        nn.Linear(128, 784),
    )
    gen.train()
    trainer = pc.PCTrainer(
        gen, T=T, update_x_at="all",
        optimizer_x_fn=optim.SGD, optimizer_x_kwargs={"lr": 0.01},
        update_p_at="never", plot_progress_at=[],
    )
    pseudo = torch.zeros(batch, 20)
    target = (torch.rand(batch, 784) > 0.5).float()
    kwargs = dict(
        loss_fn=bernoulli_fn, loss_fn_kwargs={"_target": target},
        callback_after_t=random_step, callback_after_t_kwargs={"_pc_trainer": trainer},
        is_log_progress=False, is_return_results_every_t=False,
        is_checking_after_callback_after_t=False,
    )
    # warm-up run
    trainer.train_on_batch(inputs=pseudo, **kwargs)
    t0 = time.perf_counter()
    trainer.train_on_batch(inputs=pseudo, is_sample_x_at_batch_start=False, **kwargs)
    dt = time.perf_counter() - t0
    print(f"reference CPU: {T} steps, batch {batch}: {dt:.2f}s -> {T/dt:.2f} steps/sec")
    return T / dt

if __name__ == "__main__":
    main()
