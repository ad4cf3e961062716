"""Pallas kernel correctness vs pure-JAX references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexynesis_tpu.ops.pallas.fused_linear import (
    fused_linear_bn_relu,
    fused_linear_bn_relu_eval,
)
from flexynesis_tpu.ops.pallas.mmd_kernel import (
    compute_mmd_pallas,
    gaussian_kernel_mean,
)


def reference_block(x, w, b, gamma, beta, eps=1e-5):
    h = x @ w + b
    mu = h.mean(axis=0)
    var = h.var(axis=0)
    hn = (h - mu) / np.sqrt(var + eps)
    y = np.maximum(hn * gamma + beta, 0.0)
    return y, h, mu, var


class TestFusedLinearBNRelu:
    @pytest.mark.parametrize("B,F,H", [(32, 100, 64), (16, 257, 130)])
    def test_forward_matches_reference(self, rng, B, F, H):
        x = rng.normal(size=(B, F)).astype(np.float32)
        w = (rng.normal(size=(F, H)) * 0.1).astype(np.float32)
        b = rng.normal(size=H).astype(np.float32)
        gamma = rng.normal(size=H).astype(np.float32) * 0.5 + 1.0
        beta = rng.normal(size=H).astype(np.float32) * 0.1
        y, mu, var = fused_linear_bn_relu(
            jnp.array(x), jnp.array(w), jnp.array(b),
            jnp.array(gamma), jnp.array(beta),
        )
        y_ref, _, mu_ref, var_ref = reference_block(x, w, b, gamma, beta)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-3, atol=1e-4)

    def test_gradients_match_autodiff_reference(self, rng):
        B, F, H = 16, 40, 24
        x = jnp.array(rng.normal(size=(B, F)).astype(np.float32))
        w = jnp.array((rng.normal(size=(F, H)) * 0.1).astype(np.float32))
        b = jnp.array(rng.normal(size=H).astype(np.float32))
        gamma = jnp.array(np.ones(H, np.float32))
        beta = jnp.array(np.zeros(H, np.float32))

        def loss_fused(params):
            y, _, _ = fused_linear_bn_relu(*params)
            return jnp.sum(jnp.square(y))

        def loss_ref(params):
            x, w, b, gamma, beta = params
            h = x @ w + b
            mu = jnp.mean(h, axis=0)
            var = jnp.var(h, axis=0)
            hn = (h - mu) / jnp.sqrt(var + 1e-5)
            y = jnp.maximum(hn * gamma + beta, 0.0)
            return jnp.sum(jnp.square(y))

        g1 = jax.grad(loss_fused)((x, w, b, gamma, beta))
        g2 = jax.grad(loss_ref)((x, w, b, gamma, beta))
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=5e-3, atol=5e-4
            )

    def test_dropout_statistics(self, rng):
        """Dropout applies OUTSIDE the kernel (FusedMLP composes the fused
        block with nn.Dropout, same stream as the unfused MLP)."""
        import flax.linen as nn

        B, F, H = 64, 32, 128
        x = jnp.array(rng.normal(size=(B, F)).astype(np.float32))
        w = jnp.array((rng.normal(size=(F, H)) * 0.1).astype(np.float32))
        b = jnp.zeros(H, jnp.float32)
        gamma = jnp.ones(H, jnp.float32)
        beta = jnp.ones(H, jnp.float32)  # shift up so most units active
        y, _, _ = fused_linear_bn_relu(x, w, b, gamma, beta)
        h = nn.Dropout(rate=0.5, deterministic=False).apply(
            {}, y, rngs={"dropout": jax.random.key(7)}
        )
        zero_frac = float(jnp.mean(h == 0))
        assert 0.35 < zero_frac < 0.75  # ~50% dropped (plus relu zeros)
        # FusedMLP end-to-end: two dropout keys give two different outputs
        from flexynesis_tpu.ops.fused_mlp import FusedMLP

        m = FusedMLP(hidden_dim=H, output_dim=4, dropout_rate=0.5)
        variables = m.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=True,
        )
        o1, _ = m.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(2)})
        o2, _ = m.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(3)})
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_vmap_over_stacked_params_matches_loop(self, rng):
        """The trial-engine composition: vmap over a stacked trial axis.

        This exact composition failed to lower on TPU before the seed
        operand was removed (a scalar SMEM block has no legal shape under
        the pallas batching rule) — guard the semantics here; the TPU
        lowering itself is exercised by tools/measure_fused_mlp.py."""
        K, B, F, H = 3, 16, 100, 64
        xs = rng.normal(size=(K, B, F)).astype(np.float32)
        ws = (rng.normal(size=(K, F, H)) * 0.1).astype(np.float32)
        bs = rng.normal(size=(K, H)).astype(np.float32)
        gs = (rng.normal(size=(K, H)) * 0.5 + 1.0).astype(np.float32)
        be = (rng.normal(size=(K, H)) * 0.1).astype(np.float32)
        y_v, mu_v, var_v = jax.vmap(fused_linear_bn_relu)(
            jnp.array(xs), jnp.array(ws), jnp.array(bs),
            jnp.array(gs), jnp.array(be),
        )
        for k in range(K):
            y_ref, _, mu_ref, var_ref = reference_block(
                xs[k], ws[k], bs[k], gs[k], be[k]
            )
            np.testing.assert_allclose(
                np.asarray(y_v[k]), y_ref, rtol=2e-4, atol=2e-4
            )
            np.testing.assert_allclose(
                np.asarray(mu_v[k]), mu_ref, rtol=1e-4, atol=1e-4
            )

    def test_vmap_gradients_match_loop(self, rng):
        K, B, F, H = 3, 8, 40, 24
        xs = jnp.array(rng.normal(size=(K, B, F)).astype(np.float32))
        ws = jnp.array((rng.normal(size=(K, F, H)) * 0.1).astype(np.float32))
        bs = jnp.array(rng.normal(size=(K, H)).astype(np.float32))
        gs = jnp.ones((K, H), jnp.float32)
        be = jnp.zeros((K, H), jnp.float32)

        def loss(w, x, b, g, bt):
            y, _, _ = fused_linear_bn_relu(x, w, b, g, bt)
            return jnp.sum(jnp.square(y))

        g_v = jax.vmap(jax.grad(loss))(ws, xs, bs, gs, be)
        for k in range(K):
            g_k = jax.grad(loss)(ws[k], xs[k], bs[k], gs[k], be[k])
            np.testing.assert_allclose(
                np.asarray(g_v[k]), np.asarray(g_k), rtol=5e-3, atol=5e-4
            )

    def test_eval_mode_uses_running_stats(self, rng):
        B, F, H = 8, 20, 16
        x = rng.normal(size=(B, F)).astype(np.float32)
        w = (rng.normal(size=(F, H)) * 0.1).astype(np.float32)
        b = np.zeros(H, np.float32)
        gamma = np.ones(H, np.float32)
        beta = np.zeros(H, np.float32)
        rm = rng.normal(size=H).astype(np.float32) * 0.1
        rv = np.abs(rng.normal(size=H)).astype(np.float32) + 0.5
        y = fused_linear_bn_relu_eval(
            jnp.array(x), jnp.array(w), jnp.array(b), jnp.array(gamma),
            jnp.array(beta), jnp.array(rm), jnp.array(rv),
        )
        h = x @ w + b
        y_ref = np.maximum((h - rm) / np.sqrt(rv + 1e-5), 0.0)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)


class TestMMDKernel:
    def test_kernel_mean_matches_dense(self, rng):
        x = rng.normal(size=(20, 16)).astype(np.float32)
        y = rng.normal(size=(33, 16)).astype(np.float32)
        ours = float(gaussian_kernel_mean(jnp.array(x), jnp.array(y)))
        d = x.shape[1]
        diff = ((x[:, None, :] - y[None, :, :]) ** 2).mean(-1) / d
        ref = float(np.exp(-diff).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_mmd_matches_losses_module(self, rng):
        from flexynesis_tpu.ops.losses import compute_mmd

        x = rng.normal(size=(50, 8)).astype(np.float32)
        y = rng.normal(size=(64, 8)).astype(np.float32)
        a = float(compute_mmd_pallas(jnp.array(x), jnp.array(y)))
        b = float(compute_mmd(jnp.array(x), jnp.array(y)))
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)


class TestFusedMLPModel:
    def test_directpred_with_fused_kernels_trains(self, rng):
        """DirectPred(config fused_kernels=True) learns on synthetic data."""
        import jax

        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.train.trainer import train_val_split
        from flexynesis_tpu.utils.synthetic import write_synthetic_folder
        import tempfile

        with tempfile.TemporaryDirectory() as p:
            write_synthetic_folder(p, n_train=80, n_test=40, seed=31)
            imp = DataImporter(p, ["gex"], top_percentile=50, min_features=20)
            train_ds, test_ds = imp.import_data()
        cfg = {
            "latent_dim": 16, "hidden_dim_factor": 0.3, "lr": 0.01,
            "supervisor_hidden_dim": 8, "epochs": 15, "batch_size": 32,
            "fused_kernels": True,
        }
        model = DirectPred(cfg, train_ds, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)
        res = model.fit(train_ds, tr, va, lr=0.01, batch_size=32, max_epochs=15)
        assert res.val_loss < res.history["val_loss"][0]
        preds = model.predict(test_ds)
        assert np.isfinite(preds["subtype"]).all()


class TestDifferentiableMMD:
    def test_gradient_matches_xla_mmd(self, rng):
        from flexynesis_tpu.ops.losses import compute_mmd
        from flexynesis_tpu.ops.pallas.mmd_kernel import compute_mmd_pallas

        x = jnp.array(rng.normal(size=(24, 8)).astype(np.float32))
        y = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
        g_pallas = jax.grad(lambda z: compute_mmd_pallas(x, z))(y)
        g_xla = jax.grad(lambda z: compute_mmd(x, z))(y)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_xla), rtol=5e-3, atol=1e-5
        )

    def test_vae_trains_with_pallas_mmd(self, rng):
        import tempfile

        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.models.supervised_vae import SupervisedVAE
        from flexynesis_tpu.utils.synthetic import write_synthetic_folder

        with tempfile.TemporaryDirectory() as p:
            write_synthetic_folder(p, n_train=60, n_test=30, seed=33)
            imp = DataImporter(p, ["gex"], top_percentile=50, min_features=10)
            train_ds, _ = imp.import_data()
        cfg = {
            "latent_dim": 8, "hidden_dim_factor": 0.3, "lr": 0.01,
            "supervisor_hidden_dim": 8, "epochs": 8, "batch_size": 32,
            "fused_kernels": True,
        }
        model = SupervisedVAE(cfg, train_ds, target_variables=["subtype"])
        res = model.fit(train_ds, np.arange(48), np.arange(48, 60),
                        lr=0.01, batch_size=32, max_epochs=8)
        assert np.isfinite(res.val_loss)


class TestVMEMFallback:
    """Shapes whose blocks exceed the kernel's VMEM budget (production-
    scale single models) must fall back to identical unfused math instead
    of dying in the Mosaic compiler with a scoped-vmem OOM."""

    def test_large_shape_forward_matches_reference(self, rng):
        from flexynesis_tpu.ops.pallas.fused_linear import _exceeds_vmem

        B, F, H = 1024, 4096, 256
        assert _exceeds_vmem(B, F, min(256, H))  # takes the fallback path
        x = rng.normal(size=(B, F)).astype(np.float32) * 0.05
        w = (rng.normal(size=(F, H)) * 0.02).astype(np.float32)
        b = rng.normal(size=H).astype(np.float32)
        gamma = rng.normal(size=H).astype(np.float32) * 0.5 + 1.0
        beta = rng.normal(size=H).astype(np.float32) * 0.1
        y, mu, var = fused_linear_bn_relu(
            jnp.array(x), jnp.array(w), jnp.array(b),
            jnp.array(gamma), jnp.array(beta),
        )
        y_ref, _, mu_ref, var_ref = reference_block(x, w, b, gamma, beta)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-3, atol=1e-3)
        # gradients flow through the fallback (custom VJP backward is
        # shape-agnostic pure XLA)
        g = jax.grad(
            lambda w_: jnp.sum(
                fused_linear_bn_relu(
                    jnp.array(x), w_, jnp.array(b), jnp.array(gamma),
                    jnp.array(beta),
                )[0]
            )
        )(jnp.array(w))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_large_shape_eval_matches_reference(self, rng):
        B, F, H = 1024, 4096, 256
        x = rng.normal(size=(B, F)).astype(np.float32) * 0.05
        w = (rng.normal(size=(F, H)) * 0.02).astype(np.float32)
        b = rng.normal(size=H).astype(np.float32)
        gamma = np.ones(H, np.float32)
        beta = np.zeros(H, np.float32)
        rm = rng.normal(size=H).astype(np.float32) * 0.1
        rv = np.abs(rng.normal(size=H)).astype(np.float32) + 0.5
        y = fused_linear_bn_relu_eval(
            jnp.array(x), jnp.array(w), jnp.array(b), jnp.array(gamma),
            jnp.array(beta), jnp.array(rm), jnp.array(rv),
        )
        h = x @ w + b
        y_ref = np.maximum((h - rm) / np.sqrt(rv + 1e-5) * gamma + beta, 0.0)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
