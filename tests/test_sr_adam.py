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


class TestQ8Moments:
    """Block-scaled 8-bit Adam moments (q8_encode_m / q8_encode_v):
    int8-linear-SR first moment, log8 second moment. Halves the remaining
    moment traffic on the HBM-bound trial engines (bench.py roofline)."""

    def test_m_roundtrip_unbiased(self):
        from flexynesis_tpu.ops.sr_adam import q8_decode_m, q8_encode_m

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(16, 256)).astype(np.float32)
        )
        outs = [
            np.asarray(q8_decode_m(q8_encode_m(x, jnp.uint32(7 + 31 * s))))
            for s in range(64)
        ]
        s_row = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
        # single-draw error bounded by one quantization step
        assert np.max(np.abs(outs[0] - np.asarray(x)) / (s_row / 127)) <= 1.0 + 1e-5
        # stochastic rounding is unbiased: the mean over seeds converges
        err = np.abs(np.mean(outs, axis=0) - np.asarray(x))
        assert np.max(err / (s_row / 127)) < 0.2

    def test_v_log_accuracy(self):
        from flexynesis_tpu.ops.sr_adam import q8_decode_v, q8_encode_v

        rng = np.random.default_rng(1)
        # v spans many octaves within a row — the linear-int8 killer case
        v = (10.0 ** rng.uniform(-12, -1, size=(8, 512))).astype(np.float32)
        dec = np.asarray(q8_decode_v(q8_encode_v(jnp.asarray(v), jnp.uint32(3))))
        # Adam divides by sqrt(v): relative error of the denominator must
        # stay within one SR'd log8 step (2^(1/8) - 1 ~ 9%)
        rel = np.abs(np.sqrt(dec) - np.sqrt(v)) / np.sqrt(v)
        assert np.max(rel) < 0.095

    def test_zero_rows_stay_exact(self):
        from flexynesis_tpu.ops.sr_adam import (
            q8_decode_m, q8_decode_v, q8_encode_m, q8_encode_v,
        )

        x = jnp.zeros((4, 128), jnp.float32)
        for s in (0, 1, 999):
            np.testing.assert_array_equal(
                np.asarray(q8_decode_m(q8_encode_m(x, jnp.uint32(s)))), 0.0
            )
            dv = np.asarray(q8_decode_v(q8_encode_v(x, jnp.uint32(s))))
            # log8 floor decodes to ~1e-79 (f32-underflows to 0) — far
            # below Adam's eps^2 (float() avoids f32 promotion of 1e-30)
            assert float(np.max(dv)) < 1e-30

    def test_int8_state_structure(self):
        from flexynesis_tpu.ops.sr_adam import sr_adam_init, sr_adam_step

        params = {
            "big": jnp.zeros((512, 256), jnp.bfloat16),
            "small": jnp.zeros((8,), jnp.float32),
        }
        m, v, count = sr_adam_init(params, moment_dtype="int8")
        assert m["big"]["q"].dtype == jnp.int8
        assert v["big"]["q"].dtype == jnp.uint8
        assert m["big"]["s"].shape == (512, 1)
        assert m["small"].dtype == jnp.float32
        grads = {
            "big": jnp.ones((512, 256), jnp.float32) * 1e-3,
            "small": jnp.ones((8,), jnp.float32) * 1e-3,
        }
        p2, (m2, v2, c2) = sr_adam_step(
            params, (m, v, count), grads, jnp.float32(1e-3), jnp.uint32(5)
        )
        # state structure is stable across steps (lax.scan carry contract)
        assert jax.tree.structure((m2, v2, c2)) == jax.tree.structure(
            (m, v, count)
        )
        assert p2["big"].dtype == jnp.bfloat16

    def test_int8_tracks_f32_adam(self):
        import optax

        from flexynesis_tpu.ops.sr_adam import sr_adam_init, sr_adam_step

        key = jax.random.key(0)
        p0 = {"w": jax.random.normal(key, (256, 256)) * 0.1}
        g_keys = jax.random.split(jax.random.key(1), 40)

        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
        p_ref = p0
        st_ref = tx.init(p_ref)
        p_q = {"w": p0["w"].astype(jnp.bfloat16)}
        st_q = sr_adam_init(p_q, moment_dtype="int8")
        lr = 1e-2
        for t, gk in enumerate(g_keys):
            g = {"w": jax.random.normal(gk, (256, 256)) * 0.05
                 + 0.2 * p_ref["w"]}
            upd, st_ref = tx.update(g, st_ref, p_ref)
            p_ref = optax.apply_updates(
                p_ref, jax.tree.map(lambda u: -lr * u, upd)
            )
            gq = {"w": g["w"] + 0.2 * (p_q["w"].astype(jnp.float32)
                                       - p_ref["w"])}
            p_q, st_q = sr_adam_step(
                p_q, st_q, gq, jnp.float32(lr), jnp.uint32(17 + t)
            )
        diff = np.asarray(
            p_q["w"].astype(jnp.float32) - p_ref["w"]
        )
        scale = np.std(np.asarray(p_ref["w"]))
        # trajectories stay close relative to the parameter scale
        assert np.abs(diff).mean() / scale < 0.08

    def test_trial_engine_int8_matches_f32_convergence(self, rng):
        from flexynesis_tpu.data.dataset import MultiOmicDataset
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.parallel.trials import ParallelTrials

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
        for moments in ("float32", "int8"):
            model = DirectPred(cfg, ds, target_variables=["y"])
            pt = ParallelTrials(
                model, ds,
                param_dtype="float32" if moments == "float32"
                else "bfloat16_sr",
                moment_dtype=moments,
            )
            out = pt.run(lrs=np.full(2, 5e-3), seeds=np.arange(2),
                         train_idx=tr, val_idx=va, batch_size=32,
                         max_epochs=10, epochs_per_eval=10)
            losses[moments] = out["best_val_loss"]
        assert np.all(np.isfinite(losses["int8"]))
        assert np.all(
            losses["int8"] < np.maximum(losses["float32"] * 1.15, 0.25)
        )
