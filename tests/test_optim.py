"""Low-precision-state Adam (ops/optim.py): golden parity in float32,
convergence + traffic rationale in bfloat16."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flexynesis_tpu.ops.optim import scale_by_adam_lowp, trial_optimizer


def _tree_rand(key, shapes):
    ks = jax.random.split(key, len(shapes))
    return {f"w{i}": jax.random.normal(k, s) for i, (k, s) in
            enumerate(zip(ks, shapes))}


class TestScaleByAdamLowp:
    def test_float32_state_matches_optax_exactly(self):
        """With state_dtype=float32 the transform IS optax.scale_by_adam."""
        key = jax.random.key(0)
        params = _tree_rand(key, [(8, 4), (4,), (4, 2)])
        ours = scale_by_adam_lowp(state_dtype=jnp.float32)
        ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        s_o, s_r = ours.init(params), ref.init(params)
        for i in range(5):
            g = _tree_rand(jax.random.key(i + 1), [(8, 4), (4,), (4, 2)])
            u_o, s_o = ours.update(g, s_o)
            u_r, s_r = ref.update(g, s_r)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                u_o, u_r,
            )

    def test_bf16_state_tracks_float32_updates(self):
        """bf16-stored moments give update directions within ~1% of f32."""
        key = jax.random.key(42)
        params = _tree_rand(key, [(16, 8)])
        lowp = scale_by_adam_lowp(state_dtype=jnp.bfloat16)
        full = scale_by_adam_lowp(state_dtype=jnp.float32)
        s_l, s_f = lowp.init(params), full.init(params)
        for i in range(20):
            g = _tree_rand(jax.random.key(100 + i), [(16, 8)])
            u_l, s_l = lowp.update(g, s_l)
            u_f, s_f = full.update(g, s_f)
        cos = float(
            jnp.vdot(u_l["w0"], u_f["w0"])
            / (jnp.linalg.norm(u_l["w0"]) * jnp.linalg.norm(u_f["w0"]))
        )
        assert cos > 0.999
        assert s_l.mu["w0"].dtype == jnp.bfloat16
        assert s_l.nu["w0"].dtype == jnp.bfloat16

    def test_bf16_quadratic_convergence(self):
        """Full bf16-state Adam still drives a quadratic to its minimum."""
        target = jnp.asarray([3.0, -2.0, 0.5, 7.0])
        params = {"x": jnp.zeros(4)}
        tx = trial_optimizer("bfloat16")
        state = tx.init(params)
        lr = 0.05

        @jax.jit
        def step(params, state):
            g = jax.grad(lambda p: jnp.sum((p["x"] - target) ** 2))(params)
            upd, state = tx.update(g, state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, upd)
            return params, state

        for _ in range(500):
            params, state = step(params, state)
        np.testing.assert_allclose(np.asarray(params["x"]), np.asarray(target),
                                   atol=0.05)

    def test_trial_engine_bf16_matches_f32_convergence(self, rng):
        """ParallelTrials with bf16 moments reaches essentially the same val
        loss as float32 moments on a learnable task."""
        from flexynesis_tpu.data.dataset import MultiOmicDataset
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.parallel.trials import ParallelTrials

        n, f = 96, 20
        cls = rng.integers(0, 2, n)
        X = (rng.normal(size=(n, f)) + 1.5 * cls[:, None]).astype(np.float32)
        ds = MultiOmicDataset(
            dat={"gex": X},
            ann={"y": cls.astype(np.float32)},
            variable_types={"y": "categorical"},
            features={"gex": [f"g{i}" for i in range(f)]},
            samples=[f"S{i}" for i in range(n)],
            label_mappings={"y": {0: "a", 1: "b"}},
        )
        cfg = {"latent_dim": 8, "hidden_dim_factor": 0.5, "lr": 5e-3,
               "supervisor_hidden_dim": 8, "epochs": 20, "batch_size": 32}
        tr, va = np.arange(72), np.arange(72, 96)
        losses = {}
        for dtype in ("float32", "bfloat16"):
            model = DirectPred(cfg, ds, target_variables=["y"])
            pt = ParallelTrials(model, ds, moment_dtype=dtype)
            out = pt.run(lrs=np.full(2, 5e-3), seeds=np.arange(2),
                         train_idx=tr, val_idx=va, batch_size=32,
                         max_epochs=20, epochs_per_eval=20)
            losses[dtype] = out["best_val_loss"]
        assert np.all(np.isfinite(losses["bfloat16"]))
        # both converge; bf16 within 10% (or better) of the f32 objective
        assert np.all(
            losses["bfloat16"] < np.maximum(losses["float32"] * 1.1, 0.2)
        )
