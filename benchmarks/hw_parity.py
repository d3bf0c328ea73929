"""Hardware parity: the Mosaic-compiled kernel vs the XLA engine on the same
deterministic inputs (noise off) — latents, captures, scalars, and a full
PC-training weight update. Interpret-mode tests cover the kernel's math; this
covers the actual TPU codegen."""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np
import montecarlopredictivecoding_tpu as mcpc

model = mcpc.make_mlp_model(20, 128, 128, 784)
B = 64
key = jax.random.PRNGKey(0)
target = (jax.random.uniform(key, (B, 784)) > 0.5).astype(jnp.float32)
inputs = jnp.zeros((B, 20))

def run(use_pallas, warm=False):
    gen = mcpc.GenerativeModel(model, key=11)
    if warm:
        tr = mcpc.PCTrainer(gen, T=40, optimizer_x_fn="adam",
                            optimizer_x_kwargs={"lr": 0.05},
                            update_p_at="last",
                            optimizer_p_fn="adam", optimizer_p_kwargs={"lr": 0.01})
    else:
        tr = mcpc.PCTrainer(gen, T=24, optimizer_x_fn="sgd",
                            optimizer_x_kwargs={"lr": 0.02},
                            update_p_at="last",
                            accumulate_p_at=list(range(8, 24)),
                            optimizer_p_fn="adam", optimizer_p_kwargs={"lr": 0.01})
    tr.use_pallas = use_pallas
    took_kernel = []
    orig_run = tr._run_pallas
    tr._run_pallas = lambda *a, **k: (took_kernel.append(1), orig_run(*a, **k))[1]
    res = tr.train_on_batch(
        inputs, loss_fn=mcpc.bernoulli_fn, loss_fn_kwargs={"_target": target},
        callback_after_t=None if warm else mcpc.LangevinStep(var=None),
        # warm mode serves reduced results only (no captures): every_t=True
        # with no trajectory request would silently fall back to the engine
        # and this gate would compare engine vs engine
        is_return_results_every_t=not warm,
        is_return_xs=not warm, capture_stride=4 if not warm else 1,
        key=jax.random.PRNGKey(3),
    )
    if use_pallas and not took_kernel:
        raise AssertionError(
            f"kernel path not taken (warm={warm}); hw parity would be vacuous"
        )
    return gen, res

def check(a, b, warm, what):
    a, b = np.asarray(a), np.asarray(b)
    if not warm:
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4, err_msg=what)
        return
    # Adam normalizes updates to ~±lr, so elements whose gradient sits at
    # the rounding boundary flip sign between any two fp implementations
    # (verified: the same isolated-element drift appears engine-vs-kernel in
    # CPU interpret mode, while the objective matches to ~3e-5 relative).
    # Warm-mode check: the bulk within the tight budget, isolated
    # sign-flip elements bounded by a few update quanta.
    d = np.abs(a - b)
    tol = 5e-4 + 5e-4 * np.abs(b)
    frac = float((d > tol).mean())
    assert frac < 0.01, f"{what}: {frac:.2%} of elements out of tolerance"
    assert d.max() < 0.2, f"{what}: max abs diff {d.max():.3f}"


for warm in (False, True):
    g_k, r_k = run(True, warm)
    g_e, r_e = run(False, warm)
    for i, (a, b) in enumerate(zip(g_k.latents, g_e.latents)):
        check(a, b, warm, f"latent {i}")
    for i, (pa, pb) in enumerate(zip(g_k.params, g_e.params)):
        check(pa["w"], pb["w"], warm, f"w{i}")
    if not warm:
        for a, b in zip(r_k["xs"], r_e["xs"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(r_k["loss"]), np.asarray(r_e["loss"]), rtol=5e-4)
    print(("warm" if warm else "langevin"), "hardware parity OK;",
          "loss[-1] =", float(r_k["loss"][-1]))
print("HW_PARITY_OK")
