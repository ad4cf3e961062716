"""Stochastically-rounded bf16 Adam (ops/sr_adam.py): hash-SR unbiasedness,
f32-trajectory tracking, and trial-engine convergence parity. Pure XLA —
the SAME code path runs on CPU tests and TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flexynesis_tpu.ops.sr_adam import (
    hash_bits,
    sr_adam_init,
    sr_adam_step,
    sr_bf16,
)


class TestHashSR:
    def test_bits_uniform(self):
        bits = np.asarray(hash_bits((64, 1024), jnp.uint32(12345)))
        low16 = bits & 0xFFFF
        # mean of uniform [0, 65536) is 32767.5; loose 3-sigma bound
        assert abs(low16.mean() - 32767.5) < 300
        # no catastrophic collisions
        assert len(np.unique(bits)) > bits.size * 0.95

    def test_unbiased(self):
        x = jnp.full((4, 2048), 0.4321, jnp.float32)
        vals = [
            np.asarray(sr_bf16(x, jnp.uint32(s * 977 + 13)).astype(jnp.float32))
            for s in range(64)
        ]
        # bf16 round-to-nearest of 0.4321 is biased; the SR *mean* is not
        assert abs(float(np.mean(vals)) - 0.4321) < 4e-4

    def test_rounds_to_neighbours(self):
        x = jnp.full((8, 128), 1.2345, jnp.float32)
        out = np.asarray(sr_bf16(x, jnp.uint32(7)).astype(jnp.float32))
        assert len(np.unique(out)) <= 2
        assert np.max(np.abs(out - 1.2345)) <= 0.01  # within one bf16 ulp

    def test_exactly_representable_values_invariant(self):
        """bf16-representable values (incl. +-0) are SR fixed points — the
        property the hetero engine's masked-padding exactness relies on."""
        vals = jnp.asarray(
            [0.0, -0.0, 1.0, -2.5, 0.375, 65280.0], jnp.bfloat16
        ).astype(jnp.float32)
        x = jnp.tile(vals, (128, 1))
        for s in (0, 1, 999, 2**31 - 1):
            out = sr_bf16(x, jnp.uint32(s)).astype(jnp.float32)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestSRAdamStep:
    def test_tracks_f32_adam(self):
        key = jax.random.key(0)
        p32 = {"w": jax.random.normal(key, (64, 32)) * 0.1}
        g_keys = jax.random.split(jax.random.key(1), 30)

        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.scale_by_adam(eps=1e-8))
        s32 = tx.init(p32)
        ref = jax.tree.map(lambda a: a, p32)

        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
        s16 = sr_adam_init(p16)

        lr = 1e-2
        for i, gk in enumerate(g_keys):
            g = {"w": jax.random.normal(gk, (64, 32))}
            u, s32 = tx.update(g, s32, ref)
            ref = jax.tree.map(lambda p, uu: p - lr * uu, ref, u)
            g16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), g)
            p16, s16 = sr_adam_step(p16, s16, g16, lr,
                                    jnp.uint32(i * 7919 + 3))
        err = float(jnp.max(jnp.abs(
            p16["w"].astype(jnp.float32) - ref["w"]
        )))
        scale = float(jnp.max(jnp.abs(ref["w"])))
        assert err < 0.05 * max(scale, 1.0), (err, scale)

    def test_count_and_dtypes(self):
        p = {"w": jnp.zeros((8, 8), jnp.bfloat16),
             "b": jnp.zeros((8,), jnp.float32)}
        s = sr_adam_init(p)
        g = {"w": jnp.ones((8, 8), jnp.bfloat16),
             "b": jnp.ones((8,), jnp.float32)}
        p, s = sr_adam_step(p, s, g, 0.1, jnp.uint32(0))
        m, v, count = s
        assert int(count) == 1
        assert p["w"].dtype == jnp.bfloat16
        assert m["w"].dtype == jnp.bfloat16
        assert p["b"].dtype == jnp.float32  # small leaves keep f32 storage
        assert m["b"].dtype == jnp.float32
        # first step of Adam moves by ~lr regardless of grad scale
        np.testing.assert_allclose(
            np.asarray(p["w"].astype(jnp.float32)), -0.1, atol=0.002
        )
        np.testing.assert_allclose(np.asarray(p["b"]), -0.1, atol=0.002)


class TestEngineParity:
    def test_trial_engine_sr_matches_f32_convergence(self, rng):
        from flexynesis_tpu.data.dataset import MultiOmicDataset
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.parallel.trials import ParallelTrials

        # f chosen so the encoder kernel (f x f/2) crosses SR_MIN_SIZE and
        # the bf16-SR path is actually exercised
        n, f = 96, 512
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
               "supervisor_hidden_dim": 8, "epochs": 10, "batch_size": 32}
        tr, va = np.arange(72), np.arange(72, 96)
        losses = {}
        for dtype in ("float32", "bfloat16_sr"):
            model = DirectPred(cfg, ds, target_variables=["y"])
            pt = ParallelTrials(model, ds, param_dtype=dtype)
            out = pt.run(lrs=np.full(2, 5e-3), seeds=np.arange(2),
                         train_idx=tr, val_idx=va, batch_size=32,
                         max_epochs=10, epochs_per_eval=10)
            losses[dtype] = out["best_val_loss"]
            assert jax.tree.leaves(out["final_params"])[0].dtype == jnp.float32
        assert np.all(np.isfinite(losses["bfloat16_sr"]))
        assert np.all(
            losses["bfloat16_sr"]
            < np.maximum(losses["float32"] * 1.15, 0.25)
        )


class TestHeteroSR:
    def test_mixed_arch_round_with_sr_params(self, rng):
        """A padded mixed-architecture group trains under bf16-SR storage;
        masked (padded) regions stay exact and losses converge."""
        from flexynesis_tpu.data.dataset import MultiOmicDataset
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        n, f = 96, 512
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
        base = {"hidden_dim_factor": 0.5, "lr": 5e-3,
                "supervisor_hidden_dim": 8, "epochs": 8, "batch_size": 32}
        cfgs = [dict(base, latent_dim=8), dict(base, latent_dim=16)]
        tmpl = dict(cfgs[0])
        tmpl.update(max_config(cfgs, [f]))
        template = DirectPred(tmpl, ds, target_variables=["y"])
        trials = build_padded_trials(template, cfgs, np.arange(2))
        out = vmapped_grid_fit(
            template, ds,
            start_params=trials["params"],
            start_stats=trials["batch_stats"],
            lrs=np.full(2, 5e-3), seeds=np.arange(2),
            train_idx=np.tile(np.arange(72), (2, 1)),
            val_idx=np.tile(np.arange(72, 96), (2, 1)),
            masks=trials["masks"], aux=trials.get("aux"),
            batch_size=32, max_epochs=8,
            param_dtype="bfloat16_sr",
        )
        assert np.all(np.isfinite(out["best_val_loss"]))
        assert np.all(out["best_val_loss"] < 0.6)
